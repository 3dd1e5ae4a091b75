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
        # _dispatch_group): canonical keys of sorted member shapes
        self._group_combos: set = set()
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
            # fused-policy env var participates in the jit cache key
            fused_mode=os.environ.get("KHMER_OCR_FUSED_DECODE"),
        )

    def _device_inputs(self, batch: PreparedBatch):
        """Pad a bucket batch to its batch bucket and move it to device."""
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

        def flush_pending():
            if not pending:
                return
            # canonicalize: sort members by device shape so a group's compiled
            # program depends on its shape MULTISET, not bucket arrival order
            group = sorted(pending, key=self._padded_shape, reverse=True)
            pending.clear()
            if len(group) == 1:
                outs = [self._dispatch_prepared(group[0], beam_width, max_len)]
            else:
                key = (tuple(self._padded_shape(b) for b in group), beam_width, max_len)
                if key in self._group_combos or len(self._group_combos) < rt.max_group_combos:
                    self._group_combos.add(key)
                    outs = self._dispatch_group(group, beam_width, max_len)
                else:
                    # combo budget exhausted: per-batch dispatch (compile count
                    # bounded by the bucket grid, all shapes reusable)
                    outs = [self._dispatch_prepared(b, beam_width, max_len) for b in group]
            inflight.append((group, outs))

        def drain_one():
            group, outs = inflight.popleft()
            for batch, (tokens, b) in zip(group, outs):
                texts = self.tokenizer.decode_batch(np.asarray(tokens)[:b])
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

    def warmup(self, beam_widths=(1, 3)) -> None:
        """Pre-compile the common (bucket, batch) shapes."""
        for bw in beam_widths:
            img = np.full((48, 120), 255, np.uint8)
            self.predict_batch([img], beam_width=bw)


def _round_up(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n
