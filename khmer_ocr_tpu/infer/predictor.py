"""End-to-end recognition engine: preprocess -> jitted encode+decode -> text.

Reference counterpart: ``OCRPredictor`` (predictor.py:12-199). Differences by
design (SURVEY.md §7):
  * The whole encode+decode path is ONE jitted function per
    (chunk-bucket, batch-bucket, beam) shape key — compiled once, cached.
  * Decoding is batched across all lines in the bucket (the reference decodes
    each image sequentially in a Python loop, predictor.py:174-193).
  * Greedy decoding runs inside `lax.while_loop` with whole-batch early exit;
    beam search runs as fixed-K masked lanes.
  * Weights come from either a converted reference checkpoint (.pth /
    .safetensors) or this framework's native Orbax checkpoints.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, ModelConfig, OCRConfig
from ..decode import beam_decode, greedy_decode
from ..models.layers import Ctx
from ..models.ocr_model import encode
from ..preprocess import PreparedBatch, Preprocessor
from ..tokenizer import Tokenizer

logger = logging.getLogger(__name__)


def _device_chunk(lines, chunk_geom: tuple[int, int]):
    """(B, H, Wb) lines -> (B, N, H, CW) windows on device: a static strided
    gather (N static slices XLA fuses into one cheap copy). Bit-identical to
    the host chunker ``chunk_line`` — the host pads lines to the bucket width
    with white, so every window is fully in-bounds."""
    cw, stride = chunk_geom
    wb = lines.shape[2]
    n = (wb - cw) // stride + 1
    return jnp.stack([lines[:, :, i * stride : i * stride + cw] for i in range(n)], axis=1)


@partial(jax.jit, static_argnames=("model_cfg", "dec_cfg", "use_beam", "precision", "chunk_geom"))
def _infer_jit(params, batch_stats, chunks, counts, model_cfg: ModelConfig, dec_cfg: DecodeConfig,
               use_beam: bool, precision: str, chunk_geom: tuple[int, int] | None = None):
    with jax.default_matmul_precision(precision):
        ctx = Ctx(num_heads=model_cfg.num_heads, dropout=0.0, deterministic=True)
        # compute dtype follows the params (bf16 params -> bf16 activations/caches)
        compute_dtype = jax.tree.leaves(params["patch"])[0].dtype
        if chunks.dtype == jnp.uint8:
            # uint8 transfer path: normalize on-device in f32 — bit-identical
            # to the host normalize(chunk_line(...)) float path
            chunks = (chunks.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        if chunks.ndim == 3:
            # uint8 LINES payload (runtime.transfer_lines): chunk on device
            chunks = _device_chunk(chunks, chunk_geom)
        chunks = chunks.astype(compute_dtype)
        memory, pad_mask, _ = encode(params, batch_stats, chunks, counts, model_cfg, ctx, train=False)
        if use_beam:
            return beam_decode(params, memory, pad_mask, model_cfg, dec_cfg)
        return greedy_decode(params, memory, pad_mask, model_cfg, dec_cfg)


@partial(jax.jit, static_argnames=("model_cfg", "dec_cfg", "use_beam", "precision", "chunk_geom"))
def _infer_multi_jit(params, batch_stats, batches, model_cfg: ModelConfig, dec_cfg: DecodeConfig,
                     use_beam: bool, precision: str, chunk_geom: tuple[int, int] | None = None):
    """Decode SEVERAL bucket batches in one compiled program — one host
    dispatch for a whole mixed-bucket sweep. On the axon-tunneled runtime a
    program call costs ~25-30 ms of host latency, so dispatch count — not
    device time — can dominate mixed-bucket workloads; fusing the sweep
    amortizes it. ``batches``: tuple of (chunks, counts) pairs."""
    return tuple(
        _infer_jit(params, batch_stats, chunks, counts, model_cfg, dec_cfg, use_beam, precision,
                   chunk_geom)
        for chunks, counts in batches
    )


@partial(jax.jit,
         static_argnames=("shapes", "model_cfg", "dec_cfg", "use_beam", "precision", "chunk_geom"))
def _infer_packed_jit(params, batch_stats, flat_u8, counts_flat, shapes,
                      model_cfg: ModelConfig, dec_cfg: DecodeConfig,
                      use_beam: bool, precision: str, chunk_geom: tuple[int, int] | None = None):
    """Grouped dispatch with PACKED I/O: the whole group rides ONE uint8
    payload buffer + ONE int32 counts vector in, and returns ONE concatenated
    uint8 token matrix out. Per-array transfer latency on the axon tunnel is
    ~10 ms each way — a 4-member group costs 8 device_puts + 4 fetches unpacked
    but 2 + 1 packed. ``shapes``: static tuple of member payload shapes; member
    payload segments are static slices of ``flat_u8``. Tokens are returned as
    uint8 (vocab_size=124 < 256 — lossless) to quarter the fetch bytes."""
    outs = []
    off = boff = 0
    for shape in shapes:
        n = int(np.prod(shape))
        chunks = jax.lax.slice(flat_u8, (off,), (off + n,)).reshape(shape)
        counts = jax.lax.slice(counts_flat, (boff,), (boff + shape[0],))
        outs.append(_infer_jit(params, batch_stats, chunks, counts, model_cfg, dec_cfg,
                               use_beam, precision, chunk_geom))
        off += n
        boff += shape[0]
    return jnp.concatenate(outs, axis=0).astype(jnp.uint8)


class Predictor:
    """Loads weights once, compiles per-shape inference functions on demand."""

    def __init__(
        self,
        model_path: str | Path | None = None,
        vocab_path: str | Path | None = None,
        config: OCRConfig | None = None,
        params=None,
        batch_stats=None,
        model_cfg: ModelConfig | None = None,
        mesh=None,
    ):
        """``mesh``: a jax.sharding.Mesh for data-parallel serving — params/stats
        replicate across it and every batch shards on its 'data' axis (the
        multi-chip inference path; the reference is single-device only)."""
        self.config = config or OCRConfig()
        self.tokenizer = Tokenizer(vocab_path)
        if params is not None:
            self.params, self.batch_stats = params, batch_stats
            self.model_cfg = model_cfg or self.config.model
        elif model_path is not None:
            self.params, self.batch_stats, self.model_cfg = self._load(model_path)
        else:
            raise ValueError("Provide either model_path or (params, batch_stats)")
        self.preprocessor = Preprocessor(self.config.preprocess, self.config.runtime)
        pre = self.config.preprocess
        self._chunk_geom = (pre.chunk_width, pre.chunk_stride)
        dtype = jnp.bfloat16 if self.config.runtime.compute_dtype == "bfloat16" else jnp.float32
        if dtype != jnp.float32:
            self.params = jax.tree.map(lambda x: x.astype(dtype), self.params)
        self.mesh = mesh
        # shape combinations already compiled by grouped dispatch (see
        # _dispatch_group): canonical keys of sorted member shapes; failed
        # combos are blacklisted so a compile-OOM is paid ONCE, not per call.
        # A combo only compiles on its SECOND sighting (_group_combo_seen) —
        # combined beam programs cost tens of seconds to compile, so a combo a
        # workload never repeats (e.g. one odd page mix) runs per-batch through
        # the bounded, reusable single-bucket programs instead.
        self._group_combos: set = set()
        self._group_combos_failed: set = set()
        self._group_combo_seen: dict = {}
        if mesh is not None:
            from ..parallel.mesh import replicate

            rep = replicate(mesh)
            self.params = jax.tree.map(lambda x: jax.device_put(x, rep), self.params)
            self.batch_stats = jax.tree.map(lambda x: jax.device_put(x, rep), self.batch_stats)
            self._n_data = mesh.shape[self.config.runtime.mesh_data_axis]
        else:
            self._n_data = 1

    def _load(self, model_path: str | Path):
        model_path = Path(model_path)
        if model_path.suffix in (".pth", ".pt", ".safetensors"):
            from ..convert.torch_loader import load_and_convert

            logger.info("Converting torch checkpoint %s", model_path.name)
            params, stats, cfg = load_and_convert(model_path, vocab_size=len(self.tokenizer))
        else:
            from ..train.checkpoint import load_checkpoint

            params, stats, cfg = load_checkpoint(model_path)
        params = jax.tree.map(jnp.asarray, params)
        stats = jax.tree.map(jnp.asarray, stats)
        return params, stats, cfg

    # -- decoding ----------------------------------------------------------

    def _dec_cfg(self, beam_width: int, max_len: int | None) -> DecodeConfig:
        import os

        return DecodeConfig(
            beam_width=max(beam_width, 1),
            max_len=min(max_len or self.model_cfg.decode_max_len, self.model_cfg.decode_max_len),
            sos_idx=self.tokenizer.sos_idx,
            eos_idx=self.tokenizer.eos_idx,
            pad_idx=self.tokenizer.pad_idx,
            # snapshot per call: DecodeConfig is a static jit arg, so the
            # fused-policy env vars participate in the jit cache key
            fused_mode=os.environ.get("KHMER_OCR_FUSED_DECODE"),
            mega_mode=os.environ.get("KHMER_OCR_MEGA_DECODE"),
            head_mode=os.environ.get("KHMER_OCR_FUSED_HEAD"),
        )

    def _padded_host(self, batch: PreparedBatch):
        """Pad a bucket batch to its batch bucket on the host."""
        b = batch.chunks.shape[0]
        padded_b = _round_up(b, self.config.runtime.batch_buckets)
        # batch must divide the data axis when serving on a mesh
        padded_b = ((padded_b + self._n_data - 1) // self._n_data) * self._n_data
        chunks = batch.chunks
        counts = batch.chunk_counts
        if padded_b != b:
            reps = padded_b - b
            chunks = np.concatenate([chunks, np.repeat(chunks[-1:], reps, axis=0)])
            counts = np.concatenate([counts, np.repeat(counts[-1:], reps, axis=0)])
        return chunks, counts, b

    def _device_inputs(self, batch: PreparedBatch):
        """Pad a bucket batch to its batch bucket and move it to device."""
        chunks, counts, b = self._padded_host(batch)
        chunks_d, counts_d = jnp.asarray(chunks), jnp.asarray(counts)
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            chunks_d = jax.device_put(chunks_d, batch_sharding(self.mesh, chunks_d.ndim))
            counts_d = jax.device_put(counts_d, batch_sharding(self.mesh, 1))
        return chunks_d, counts_d, b

    def _dispatch_prepared(self, batch: PreparedBatch, beam_width: int, max_len: int | None = None):
        """Enqueue one bucket batch on device; returns (device tokens, true B)."""
        dec_cfg = self._dec_cfg(beam_width, max_len)
        chunks_d, counts_d, b = self._device_inputs(batch)
        tokens = _infer_jit(
            self.params,
            self.batch_stats,
            chunks_d,
            counts_d,
            self.model_cfg,
            dec_cfg,
            beam_width > 1,
            self.config.runtime.matmul_precision,
            self._chunk_geom,
        )
        return tokens, b

    def _padded_shape(self, batch: PreparedBatch) -> tuple[int, int, int]:
        """(padded batch, chunk bucket, payload ndim) — the device shape this
        batch will take (ndim distinguishes the lines vs pre-chunked layouts)."""
        b = batch.chunks.shape[0]
        padded_b = _round_up(b, self.config.runtime.batch_buckets)
        padded_b = ((padded_b + self._n_data - 1) // self._n_data) * self._n_data
        return padded_b, batch.bucket_n, batch.chunks.ndim

    def _dispatch_group(self, batches: list[PreparedBatch], beam_width: int, max_len: int | None):
        """Decode several bucket batches in ONE compiled program — one host
        dispatch per group (a program call costs ~25-30 ms of host latency on
        the axon runtime; per-bucket dispatch dominates mixed workloads).
        Each distinct shape COMBINATION compiles once; warm workloads repeat
        their combinations. Returns [(tokens, true B)] aligned with input."""
        dec_cfg = self._dec_cfg(beam_width, max_len)
        inputs, bs = [], []
        for batch in batches:
            chunks_d, counts_d, b = self._device_inputs(batch)
            inputs.append((chunks_d, counts_d))
            bs.append(b)
        tokens = _infer_multi_jit(
            self.params, self.batch_stats, tuple(inputs), self.model_cfg, dec_cfg,
            beam_width > 1, self.config.runtime.matmul_precision, self._chunk_geom,
        )
        return list(zip(tokens, bs))

    def _dispatch_group_packed(self, batches: list[PreparedBatch], beam_width: int,
                               max_len: int | None):
        """Grouped dispatch with all-uint8 payloads packed into ONE flat host
        buffer (one device_put for the group instead of 2 per member) and ONE
        concatenated token fetch (see _infer_packed_jit). Single-device only —
        the mesh path keeps per-member sharded transfers."""
        dec_cfg = self._dec_cfg(beam_width, max_len)
        padded = [self._padded_host(b) for b in batches]
        shapes = tuple(c.shape for c, _, _ in padded)
        flat = np.concatenate([c.reshape(-1) for c, _, _ in padded])
        counts = np.concatenate([n for _, n, _ in padded]).astype(np.int32)
        tokens = _infer_packed_jit(
            self.params, self.batch_stats, jnp.asarray(flat), jnp.asarray(counts), shapes,
            self.model_cfg, dec_cfg, beam_width > 1,
            self.config.runtime.matmul_precision, self._chunk_geom,
        )

        def realize():
            arr = np.asarray(tokens)  # ONE fetch for the whole group
            outs, boff = [], 0
            for (c, _, b) in padded:
                outs.append((arr[boff : boff + b], b))
                boff += c.shape[0]
            return outs

        return realize

    def _decode_prepared(self, batch: PreparedBatch, beam_width: int) -> list[str]:
        tokens, b = self._dispatch_prepared(batch, beam_width)
        return self.tokenizer.decode_batch(np.asarray(tokens)[:b])

    # -- public API ----------------------------------------------------------

    def predict(self, image_input, beam_width: int = 3, max_len: int | None = None) -> str:
        """One line image -> text (reference predictor.predict, predictor.py:48-83)."""
        return self.predict_batch([image_input], beam_width=beam_width, max_len=max_len)[0]

    def predict_batch(self, image_list: list, beam_width: int = 1, batch_size: int = 8,
                      max_len: int | None = None) -> list[str]:
        """Batched recognition (reference predict_batch, predictor.py:138-199) —
        but decode is batched on device instead of per-image Python loops.

        ``max_len`` caps decode steps below the model's decode_max_len (the
        standalone KhmerOCRInference variant uses 128, inference.py:213)."""
        if not image_list:
            return []
        results: list[str | None] = [None] * len(image_list)
        # pipelined: host prep streams batches (thread pool) while the device
        # runs earlier ones; bucket batches are dispatched in GROUPS through
        # one compiled program each (host dispatch ~25-30 ms/call would
        # otherwise dominate mixed-bucket jobs). In-flight device work is
        # bounded at 2 groups x group_size = 2 * max_inflight_batches batches
        # before results drain (config.RuntimeConfig docstring).
        from collections import deque

        rt = self.config.runtime
        group_size = max(1, rt.max_inflight_batches)
        inflight: deque = deque()
        pending: list[PreparedBatch] = []

        def _realize_members(outs):
            return lambda: [(np.asarray(tokens)[:b], b) for tokens, b in outs]

        def flush_pending():
            if not pending:
                return
            # canonicalize: sort members by device shape so a group's compiled
            # program depends on its shape MULTISET, not bucket arrival order
            group = sorted(pending, key=self._padded_shape, reverse=True)
            pending.clear()
            if len(group) == 1:
                realize = _realize_members([self._dispatch_prepared(group[0], beam_width, max_len)])
            else:
                key = (tuple(self._padded_shape(b) for b in group), beam_width, max_len)
                seen = self._group_combo_seen.get(key, 0)
                self._group_combo_seen[key] = seen + 1
                if key not in self._group_combos_failed and (
                    key in self._group_combos
                    or (seen >= 1 and len(self._group_combos) < rt.max_group_combos)
                ):
                    self._group_combos.add(key)
                    try:
                        if self.mesh is None and all(b.chunks.dtype == np.uint8 for b in group):
                            realize = self._dispatch_group_packed(group, beam_width, max_len)
                        else:
                            realize = _realize_members(
                                self._dispatch_group(group, beam_width, max_len)
                            )
                    except jax.errors.JaxRuntimeError:
                        # a COMBINED program can exceed per-kernel scoped-VMEM /
                        # HBM limits its members respect individually (layout
                        # assignment differs in the fused context); per-batch
                        # programs are the validated envelope — fall back
                        logger.warning(
                            "grouped-dispatch compile failed for combo %s; "
                            "falling back to per-batch dispatch", key, exc_info=True,
                        )
                        self._group_combos.discard(key)
                        self._group_combos_failed.add(key)
                        realize = _realize_members(
                            [self._dispatch_prepared(b, beam_width, max_len) for b in group]
                        )
                else:
                    # combo budget exhausted: per-batch dispatch (compile count
                    # bounded by the bucket grid, all shapes reusable)
                    realize = _realize_members(
                        [self._dispatch_prepared(b, beam_width, max_len) for b in group]
                    )
            inflight.append((group, realize))

        def drain_one():
            group, realize = inflight.popleft()
            for batch, (tokens, b) in zip(group, realize()):
                texts = self.tokenizer.decode_batch(tokens)
                for idx, text in zip(batch.indices, texts):
                    results[idx] = text

        for batch in self.preprocessor.iter_batches(image_list, max_batch=batch_size):
            pending.append(batch)
            if len(pending) == group_size:
                flush_pending()
            if len(inflight) > 1:
                drain_one()
        flush_pending()
        while inflight:
            drain_one()
        return results  # type: ignore[return-value]

    def warmup(self, beam_widths=(1, 3), batch_size: int | None = None,
               chunk_buckets: tuple[int, ...] | None = None) -> None:
        """Pre-compile the serving shapes AND their canonical group template.

        Feeds ``batch_size`` white lines per chunk bucket through
        ``predict_batch`` so (a) each (chunk-bucket, batch-bucket) program and
        (b) the sorted multi-batch combination grouped dispatch will actually
        form compile once here, against the persistent cache. Beam compiles
        take tens of seconds per shape — warm the buckets your workload hits
        (default: the first four, covering lines up to ~8 chunks), not all 14.

        Runs each workload TWICE: a group combo only compiles on its second
        sighting (see _group_combo_seen), so the first pass seeds the combo and
        compiles the per-bucket programs, the second compiles the combined one.
        """
        rt = self.config.runtime
        bsz = batch_size or max(rt.batch_buckets)
        buckets = chunk_buckets or rt.chunk_buckets[:4]
        cw, stride = self._chunk_geom
        h = self.config.preprocess.img_height
        imgs = []
        for nb in buckets:
            w = (nb - 1) * stride + cw
            imgs += [np.full((h, w), 255, np.uint8)] * bsz
        for bw in beam_widths:
            for _ in range(2):
                self.predict_batch(imgs, beam_width=bw, batch_size=bsz)


def _round_up(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n
