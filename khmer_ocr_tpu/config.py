"""Unified configuration tree for the whole framework.

The reference scatters configuration across four uncoordinated mechanisms
(`netra_ocr/recognition/config.py:4-13` dataclass, `netra_ocr/detection/config.py:3-52`
class constants, module-level CONFIG dicts in `scripts/generate_*.py`, and per-CLI
argparse defaults). Here everything lives in one frozen dataclass tree so configs
are hashable (usable as jit static args) and serialize cleanly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PreprocessConfig:
    """Host-side image preprocessing (reference: netra_ocr/recognition/preprocessor.py:8-58).

    Images are resized to ``img_height`` preserving aspect ratio (width floored at
    ``chunk_width // 2``, per the packaged path `preprocessor.py:47`), sliced into
    ``chunk_width``-px windows with ``chunk_overlap``-px overlap (stride =
    chunk_width - chunk_overlap), last window white-padded, then normalized
    (x - 0.5) / 0.5.
    """

    img_height: int = 48
    chunk_width: int = 100
    chunk_overlap: int = 16
    # Minimum resized width. The packaged reference floors at chunk_width // 2 = 50
    # (`preprocessor.py:47`); the HF-hub standalone floors at 10 (`inference.py:102`).
    # We follow the packaged path — that is what produced the published CER numbers.
    min_width: int = 50
    # Binarization eval variant (CNN-Transformer.ipynb [cell 20]):
    # Otsu threshold after a 5x5 Gaussian blur, applied BEFORE the resize.
    binarize: bool = False

    @property
    def chunk_stride(self) -> int:
        return self.chunk_width - self.chunk_overlap

    def num_chunks(self, width: int) -> int:
        """Chunk count for a resized width (reference loop `preprocessor.py:21-31`):
        windows start at 0, stride ``chunk_stride``, while start < W."""
        if width <= 0:
            return 1
        return (width - 1) // self.chunk_stride + 1


@dataclass(frozen=True)
class ModelConfig:
    """Recognition model hyperparameters (reference: se_model.py:210-239, config.py:4-13)."""

    backbone: str = "se_vgg"  # "se_vgg" | "vgg" | "resnet"
    vocab_size: int = 124
    pad_idx: int = 0
    emb_dim: int = 384
    num_heads: int = 8
    enc_layers: int = 2  # constructed with num_layers=2 (se_model.py:219)
    dec_layers: int = 2  # constructed with num_layers=2 (se_model.py:236-237)
    enc_ffn_dim: int = 1024  # make_encoder default (se_model.py:119-126)
    dropout: float = 0.1
    max_global_len: int = 4096  # learned global positions (se_model.py:221)
    decode_max_len: int = 256  # decoder pos_emb length (se_model.py:170)
    patch_max: int = 256  # patch-encoder local positions (se_model.py:87)
    use_bilstm: bool = True  # SE (proposed) model only (se_model.py:228-234)

    @property
    def dec_ffn_dim(self) -> int:
        # dim_feedforward=emb_dim*4 (se_model.py:168)
        return self.emb_dim * 4

    @property
    def head_dim(self) -> int:
        assert self.emb_dim % self.num_heads == 0
        return self.emb_dim // self.num_heads

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DecodeConfig:
    """Decode-time settings (reference: predictor.py:85-136)."""

    beam_width: int = 3
    max_len: int = 256
    sos_idx: int = 2
    eos_idx: int = 3
    pad_idx: int = 0
    # Fused Pallas decode-step policy ("0" off / "1" force / None auto).
    # DecodeConfig is a static jit argument, so carrying the flag HERE makes it
    # part of the jit cache key: the Predictor snapshots KHMER_OCR_FUSED_DECODE
    # per call (infer/predictor.py::_dec_cfg), so toggling the env var between
    # calls recompiles instead of being silently ignored by a warm cache.
    # None falls back to reading the env var at TRACE time (direct
    # greedy_decode/beam_decode callers): a toggle after a shape has compiled
    # is then invisible to that shape until a fresh jit wrapper is traced.
    fused_mode: str | None = None
    # Whole-decode beam megakernel policy (KHMER_OCR_MEGA_DECODE: "0" off /
    # "1" force-interpret off-TPU / None auto) — same snapshot semantics as
    # fused_mode, independent switch (ops/pallas/decode_loop.py).
    mega_mode: str | None = None
    # In-kernel decode head (out-proj + log-softmax in the last fused layer
    # kernel, KHMER_OCR_FUSED_HEAD). OPT-IN ("1"): measured on v5e at bench
    # shapes it is PAR-to-slightly-slower than XLA's head ops (271 vs 259
    # us/step beam-3, B=128 Tm=128) — the tiny dense+log_softmax were already
    # overlapped by the while_loop, and the fused head lengthens the last
    # kernel's critical path. Same lesson as the megakernel: fusion buys
    # nothing once launches amortize. Kept for tile experiments.
    # Scope: BEAM-ONLY — greedy decode never fuses the head and ignores both
    # this field and the env var. With None, beam_decode reads the env var at
    # TRACE time (same fallback as fused_mode); the Predictor snapshots it
    # here per call so env toggles recompile instead of being silently ignored.
    head_mode: str | None = None


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU execution settings — no reference counterpart (reference is eager torch).

    ``param_dtype`` is always float32; ``compute_dtype``/``matmul_precision`` trade
    parity for MXU throughput. Parity mode: float32 + "highest". Perf mode:
    bfloat16 + "default".
    """

    compute_dtype: str = "float32"
    matmul_precision: str = "highest"
    # Static width buckets expressed in chunks-per-line; each bucket compiles once.
    chunk_buckets: tuple[int, ...] = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)
    # Static batch buckets (lines per device batch).
    batch_buckets: tuple[int, ...] = (1, 8, 32, 128, 256)
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    # Host input pipeline: threads for PIL decode/resize/chunk (overlapping the
    # device), and the dispatch-group size. Bucket batches are dispatched in
    # groups of ``max_inflight_batches`` through one compiled program each, and
    # at most TWO groups are in flight before results drain — so device-queue
    # memory is bounded at 2 * max_inflight_batches batches.
    host_workers: int = 8
    max_inflight_batches: int = 4
    # Cap on DISTINCT multi-batch shape combinations compiled by grouped
    # dispatch (each combination is one XLA program; beam compiles take tens of
    # seconds). Groups are canonicalized by sorting members on shape, and once
    # the cap is reached an unseen combination falls back to per-batch
    # dispatch — whose compile count is bounded by the bucket grid.
    max_group_combos: int = 8
    # Ship inference batches to the device as uint8 and normalize on-device:
    # 4x less host->device traffic (the axon-tunneled transfer dominates
    # end-to-end serving otherwise). Bit-identical to host normalization —
    # every preprocessed pixel sits on the uint8/255 grid (PIL L-mode resize
    # and the native loader both emit uint8-derived values).
    transfer_uint8: bool = True
    # Ship whole uint8 LINES (B, H, Wb) and extract the 100-px windows ON
    # DEVICE with a static strided gather instead of pre-chunking on the host:
    # removes the host chunk copies AND the 16-px overlap duplication from the
    # tunnel transfer (~1.19x). Requires transfer_uint8. Bit-identical to the
    # host chunker (tests/test_foundations.py::test_device_chunking_parity).
    transfer_lines: bool = True
    # Width cap (px) of the native loader's REUSED slab buffer. The full
    # 128-chunk width (10768 px) would make each 512-image slab a fresh 264 MB
    # allocation whose first-touch page faults dominate host prep (measured
    # 58 ms/image vs 0.2 ms at a tight cap). 2048 px covers lines up to 23
    # chunks; rarer wider lines fall back to a tight per-image native decode.
    slab_cap_w: int = 2048
    # Deadline (ms) after which a PARTIALLY-filled chunk bucket is flushed to
    # the device instead of waiting for max_batch lines: device decode starts
    # while host prep is still streaming, instead of bursting at end-of-stream
    # (at batch 256 most buckets only fill when the stream ends). 0 disables
    # (flush only at max_batch / stream end). Partial batches pad to the
    # normal batch buckets; timing-dependent batch sizes mean grouped-dispatch
    # shape combos vary run to run, so combos beyond the compile budget fall
    # back to per-batch dispatch — the deadline trades that dispatch overhead
    # for prep/device overlap.
    flush_deadline_ms: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference: CNN-Transformer.ipynb [cells 14,17], readme.md:105-114)."""

    batch_size: int = 32
    num_epochs: int = 100
    epoch_sample_size: int = 50_000
    base_lr: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # Staged cyclic LR: epochs 1-15 fixed base_lr; 16-30 cyclic 1e-5..1e-4;
    # 31+ cyclic 1e-6..1e-5 (step_size_up = steps_per_epoch // 2).
    stage2_start_epoch: int = 16
    stage3_start_epoch: int = 31
    stage2_lr: tuple[float, float] = (1e-5, 1e-4)
    stage3_lr: tuple[float, float] = (1e-6, 1e-5)
    augment_prob: float = 0.8
    checkpoint_every_epochs: int = 10
    max_label_len: int = 256
    seed: int = 0


@dataclass(frozen=True)
class OCRConfig:
    """Top-level config tree."""

    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "OCRConfig":
        return dataclasses.replace(self, **kw)


def backbone_for_path(model_path: str) -> str:
    """Pick the backbone variant from the weight filename, mirroring
    `recognize_text.py:39-44` ("vgg" / "resnet" substring, else SE)."""
    name = str(model_path).lower()
    if "vgg" in name:
        return "vgg"
    if "resnet" in name:
        return "resnet"
    return "se_vgg"
