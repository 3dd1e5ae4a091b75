"""Training input pipeline: samples -> augment -> chunk -> static bucketed batches.

Reference counterpart: ``KhmerOCRDataset`` + ``khmer_collate_fn``
(CNN-Transformer.ipynb [cell 9]) — which emit ragged Python lists of per-image
chunk tensors. TPU redesign (SURVEY.md §7 "hard parts" #1): every batch is a
static (B, N_bucket, 48, 100) array + (B,) chunk counts + (B, L_bucket) labels.
Samples are grouped by chunk-count bucket and label-length bucket so the train
step compiles once per (N, L) pair; a fixed batch size is kept by padding the
tail batch with repeats (masked out of the loss by zero-weighting? no — repeats
are real samples; the gradient double-counts <= B-1 of them once per epoch tail,
which matches the reference's drop_last=False semantics closely enough and keeps
shapes static).

Host-side work (PIL resize, augmentation, chunk slicing) runs in a thread pool —
the analog of the reference's DataLoader workers.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..config import PreprocessConfig, TrainConfig
from ..preprocess import chunk_line, load_grayscale, normalize, resize_line, resize_line_u8
from ..tokenizer import Tokenizer
from .augment import Augmenter

LABEL_BUCKETS = (16, 32, 64, 128, 256)
CHUNK_BUCKETS_TRAIN = (1, 2, 3, 4, 6, 8, 12, 16)
# Label-bucket floor per chunk bucket: wider lines carry longer text, so tying
# the label bucket to the chunk bucket collapses the (chunk, label) shape grid
# from ~|C|x|L| combos to ~|C| — each combo costs a full train-step compile.
LABEL_FLOOR = {1: 32, 2: 32, 3: 64, 4: 64, 6: 64, 8: 128, 12: 128, 16: 256}


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _label_bucket(n_ids: int, nb: int, cap: int | None = None) -> int:
    lb = max(_bucket(n_ids, LABEL_BUCKETS), LABEL_FLOOR.get(nb, 64))
    # the teacher-forcing input (lb - 1 tokens) must fit the decoder pos_emb
    return min(lb, cap) if cap else lb


@dataclasses.dataclass
class Batch:
    chunks: np.ndarray | None  # (B, N, H, CW) normalized float32 (host mode)
    chunk_counts: np.ndarray  # (B,)
    labels: np.ndarray  # (B, L) int32, <sos>...<eos><pad>*
    texts: list[str]
    # device-augment mode: raw uint8 LINES padded to the bucket width; the
    # train step augments/chunks/normalizes ON DEVICE (train/device_augment.py)
    lines: np.ndarray | None = None  # (B, H, Wb) uint8
    widths: np.ndarray | None = None  # (B,) int32 true widths

    def as_dict(self):
        if self.lines is not None:
            return {"lines": self.lines, "widths": self.widths,
                    "chunk_counts": self.chunk_counts, "labels": self.labels}
        return {"chunks": self.chunks, "chunk_counts": self.chunk_counts, "labels": self.labels}


class LineDataset:
    """In-memory list of (image, text) samples with per-epoch random subsampling
    (the reference samples 50k of 200k each epoch, [cell 17])."""

    def __init__(self, samples: list, tokenizer: Tokenizer | None = None,
                 preprocess: PreprocessConfig | None = None, augment: bool = False,
                 train_cfg: TrainConfig | None = None, device_augment: bool = False):
        """``device_augment``: ship raw uint8 lines and run augmentation inside
        the jitted train step (train/device_augment.py) — host work per sample
        drops from ~1 ms (cv2) to a memcpy, lifting the single-core input
        pipeline from ~200 lines/s to the device rate (round-2 VERDICT weak
        #3). Resized lines are memoized across epochs (uint8, lazy)."""
        self.samples = samples
        self.tokenizer = tokenizer or Tokenizer()
        self.pre = preprocess or PreprocessConfig()
        self.train_cfg = train_cfg or TrainConfig()
        self.device_augment = device_augment
        self.augmenter = (
            Augmenter(self.train_cfg.augment_prob) if (augment and not device_augment) else None
        )
        self._line_cache: dict[int, np.ndarray] = {}

    def __len__(self):
        return len(self.samples)

    def _prepare_one(self, idx: int, rng: np.random.Generator):
        image, text = self.samples[idx]
        line = resize_line(load_grayscale(image), self.pre)
        if self.augmenter is not None:
            line = self.augmenter(line, rng)
        n = min(self.pre.num_chunks(line.shape[1]), CHUNK_BUCKETS_TRAIN[-1])
        return line, n, text

    def _prepare_one_u8(self, idx: int):
        """Device-augment mode: resize once (memoized), no host augmentation."""
        line = self._line_cache.get(idx)
        if line is None:
            image, _ = self.samples[idx]
            line = resize_line_u8(load_grayscale(image), self.pre)
            self._line_cache[idx] = line
        text = self.samples[idx][1]
        n = min(self.pre.num_chunks(line.shape[1]), CHUNK_BUCKETS_TRAIN[-1])
        return line, n, text

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      sample_size: int | None = None, num_workers: int = 8,
                      max_label_len: int | None = None):
        """Yields statically-shaped Batch objects covering a random epoch subset.

        Streaming producer: samples are resized/augmented in a thread pool and
        emitted the moment a (chunk-bucket, label-bucket) group fills a batch —
        host preprocessing overlaps device training instead of stalling each
        epoch on a full-dataset prepare. Partial buckets flush (padded with
        repeats) at epoch end.
        """
        idxs = np.arange(len(self.samples))
        if sample_size is not None and sample_size < len(idxs):
            idxs = rng.choice(idxs, size=sample_size, replace=False)
        else:
            rng.shuffle(idxs)
        child_seeds = rng.integers(0, 2**31, size=len(idxs))

        groups: dict[tuple[int, int], list] = {}
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            if self.device_augment:
                prepared_iter = pool.map(self._prepare_one_u8, idxs.tolist())
            else:
                prepared_iter = pool.map(
                    lambda t: self._prepare_one(t[0], np.random.default_rng(t[1])),
                    zip(idxs.tolist(), child_seeds.tolist()),
                )
            cap = max_label_len or self.train_cfg.max_label_len
            for line, n, text in prepared_iter:
                ids = self.tokenizer.encode(text)
                nb = _bucket(n, CHUNK_BUCKETS_TRAIN)
                key = (nb, _label_bucket(len(ids), nb, cap))
                bucket = groups.setdefault(key, [])
                bucket.append((line, n, ids, text))
                if len(bucket) == batch_size:
                    yield self._assemble(bucket, *key)
                    groups[key] = []
        for (nb, lb), items in groups.items():
            if not items:
                continue
            while len(items) < batch_size:  # static batch: pad with repeats
                items = items + items[: batch_size - len(items)]
            yield self._assemble(items, nb, lb)

    def _assemble(self, part, nb: int, lb: int) -> Batch:
        b = len(part)
        counts = np.zeros((b,), np.int32)
        labels = np.full((b, lb), self.tokenizer.pad_idx, np.int32)
        texts = []
        if self.device_augment:
            wb = (nb - 1) * self.pre.chunk_stride + self.pre.chunk_width
            lines = np.full((b, self.pre.img_height, wb), 255, np.uint8)
            widths = np.zeros((b,), np.int32)
        else:
            chunks = np.zeros((b, nb, self.pre.img_height, self.pre.chunk_width), np.float32)
        for i, (line, n, ids, text) in enumerate(part):
            if self.device_augment:
                keep = min(line.shape[1], lines.shape[2])
                lines[i, :, :keep] = line[:, :keep]
                widths[i] = keep
            else:
                chunks[i] = normalize(chunk_line(line, self.pre, nb))
            counts[i] = n
            if len(ids) > lb:
                ids = ids[: lb - 1] + [self.tokenizer.eos_idx]
            labels[i, : len(ids)] = ids
            texts.append(text)
        if self.device_augment:
            return Batch(None, counts, labels, texts, lines=lines, widths=widths)
        return Batch(chunks, counts, labels, texts)


def load_folder_dataset(root, tokenizer=None) -> LineDataset:
    """Load an images/+labels/ folder pair (KHOB test-set layout, [cell 19])."""
    from pathlib import Path

    from ..metrics import IMG_EXTS

    root = Path(root)
    samples = []
    for img in sorted((root / "images").iterdir()):
        if img.suffix.lower() not in IMG_EXTS:
            continue
        lab = root / "labels" / (img.stem + ".txt")
        if lab.exists():
            samples.append((str(img), lab.read_text(encoding="utf-8").strip()))
    return LineDataset(samples, tokenizer)


def load_hf_dataset(names: list[str], tokenizer=None, **kw) -> LineDataset:
    """Materialize HuggingFace datasets with 'image' and 'label' columns
    (reference [cell 11])."""
    import datasets as hfds

    samples = []
    for name in names:
        ds = hfds.load_dataset(name, split="train") if isinstance(name, str) else name
        for ex in ds:
            samples.append((ex["image"], ex["label"]))
    return LineDataset(samples, tokenizer, **kw)
