"""HF-datasets training path: generator -> `to_hf_dataset` -> `load_hf_dataset`
-> bucketed train batches (reference workflow CNN-Transformer.ipynb [cell 11]:
`load_dataset(...)` with 'image'/'label' columns feeding the collate)."""

import numpy as np
import pytest

hfds = pytest.importorskip("datasets")

from khmer_ocr_tpu.config import OCRConfig
from khmer_ocr_tpu.data.generator import DocumentTextGenerator
from khmer_ocr_tpu.train.data import LineDataset, load_hf_dataset


def _tiny_hf_dataset(n=6):
    gen = DocumentTextGenerator(seed=11, augment=False, words_per_sample=(1, 2))
    return gen.to_hf_dataset(n, processes=1), gen


def test_generator_to_hf_dataset_columns():
    ds, _ = _tiny_hf_dataset(4)
    assert set(ds.column_names) >= {"image", "label"}
    assert len(ds) == 4
    ex = ds[0]
    assert ex["label"] and isinstance(ex["label"], str)
    assert hasattr(ex["image"], "size")  # PIL image


def test_load_hf_dataset_roundtrip_batches():
    ds, _ = _tiny_hf_dataset(6)
    # load_hf_dataset accepts in-memory Dataset objects in place of hub names
    dataset = load_hf_dataset([ds])
    assert isinstance(dataset, LineDataset) and len(dataset) == 6
    cfg = OCRConfig()
    rng = np.random.default_rng(0)
    batches = list(dataset.epoch_batches(batch_size=3, rng=rng,
                                         max_label_len=cfg.model.decode_max_len + 1))
    assert batches, "no batches produced"
    for b in batches:
        assert b.chunks.ndim == 4 and b.chunks.shape[2:] == (48, 100)
        # static shapes: every batch is exactly batch_size (partial buckets
        # flush padded with repeats — documented epoch_batches behavior)
        assert b.chunks.shape[0] == 3 and b.labels.shape[0] == 3
        assert np.all(b.chunk_counts >= 1)
    assert sum(b.chunks.shape[0] for b in batches) >= 6
    # labels must round-trip through the tokenizer (garbage-free vocab)
    tok = dataset.tokenizer
    text = ds[0]["label"]
    assert tok.decode(tok.encode(text)) == text


def test_load_hf_dataset_multiple_sources_concatenate():
    ds1, _ = _tiny_hf_dataset(3)
    ds2, _ = _tiny_hf_dataset(4)
    dataset = load_hf_dataset([ds1, ds2])
    assert len(dataset) == 7
