"""Unit tests: tokenizer, metrics, adaptive pool, preprocessing golden parity."""

import math

import numpy as np
import pytest
from PIL import Image

from khmer_ocr_tpu.config import PreprocessConfig, RuntimeConfig
from khmer_ocr_tpu.metrics import calculate_cer, levenshtein
from khmer_ocr_tpu.ops.adaptive_pool import adaptive_pool_matrix
from khmer_ocr_tpu.preprocess import Preprocessor, chunk_line, load_grayscale, normalize, resize_line
from khmer_ocr_tpu.tokenizer import Tokenizer


def chunk_image_ref(img: np.ndarray, chunk_width=100, overlap=16) -> list[np.ndarray]:
    """Reference chunker semantics (preprocessor.py:16-33) re-run in numpy:
    while-loop slicing with white padding of the short last chunk."""
    h, w = img.shape
    chunks, start = [], 0
    while start < w:
        end = min(start + chunk_width, w)
        chunk = img[:, start:end]
        if chunk.shape[1] < chunk_width:
            pad = np.full((h, chunk_width - chunk.shape[1]), 1.0, img.dtype)
            chunk = np.concatenate([chunk, pad], axis=1)
        chunks.append(chunk)
        start += chunk_width - overlap
    return chunks


# --- tokenizer -------------------------------------------------------------


def test_tokenizer_roundtrip():
    tok = Tokenizer()
    assert len(tok) == 124
    assert (tok.pad_idx, tok.unk_idx, tok.sos_idx, tok.eos_idx) == (0, 1, 2, 3)
    text = "123 ខ្មែរ"  # vocab covers digits/punctuation + Khmer (no Latin letters)
    ids = tok.encode(text)
    assert ids[0] == tok.sos_idx and ids[-1] == tok.eos_idx
    assert tok.decode(ids) == text


def test_tokenizer_decode_stops_at_eos():
    tok = Tokenizer()
    ids = tok.encode("១២", add_special=False)
    seq = [tok.sos_idx] + ids + [tok.eos_idx] + tok.encode("៣៤", add_special=False)
    assert tok.decode(seq) == "១២"


def test_tokenizer_unk_fallback():
    tok = Tokenizer()
    ids = tok.encode("→", add_special=False)  # not in vocab
    assert ids == [tok.unk_idx]


def test_encode_padded():
    tok = Tokenizer()
    arr, lengths = tok.encode_padded(["១២", "១"], max_len=8)
    assert arr.shape == (2, 8)
    assert lengths.tolist() == [4, 3]
    assert arr[1, 3:].tolist() == [0] * 5


# --- metrics ---------------------------------------------------------------


def _naive_lev(a, b):
    d = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
    d[:, 0] = np.arange(len(a) + 1)
    d[0, :] = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return d[-1, -1]


def test_levenshtein_known():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("same", "same") == 0


def test_levenshtein_random_vs_naive():
    rng = np.random.RandomState(0)
    alphabet = "abcdefខ្មែរ"
    for _ in range(30):
        a = "".join(rng.choice(list(alphabet), rng.randint(0, 12)))
        b = "".join(rng.choice(list(alphabet), rng.randint(0, 12)))
        assert levenshtein(a, b) == _naive_lev(a, b), (a, b)


def test_cer_edge_cases():
    assert calculate_cer("", "") == 0.0
    assert calculate_cer("", "x") == 1.0
    assert calculate_cer("abcd", "abcd") == 0.0
    assert calculate_cer("abcd", "abcx") == 0.25


# --- adaptive pool ---------------------------------------------------------


@pytest.mark.parametrize("in_size,out_size", [(3, 2), (25, 32), (25, 25), (7, 3), (5, 8)])
def test_adaptive_pool_matrix_semantics(in_size, out_size):
    """Check against PyTorch's documented bin arithmetic: start = floor(i*in/out),
    end = ceil((i+1)*in/out). (Activation-level torch comparison runs in the
    subprocess-oracle parity suite — the whole backbone includes this pool.)"""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, in_size, in_size).astype(np.float32)
    ref = np.zeros((2, 4, out_size, out_size), np.float32)
    for i in range(out_size):
        h0, h1 = (i * in_size) // out_size, math.ceil((i + 1) * in_size / out_size)
        for j in range(out_size):
            w0, w1 = (j * in_size) // out_size, math.ceil((j + 1) * in_size / out_size)
            ref[:, :, i, j] = x[:, :, h0:h1, w0:w1].mean(axis=(2, 3))
    m = adaptive_pool_matrix(in_size, out_size)
    ours = np.einsum("oh,bchw->bcow", m, x)
    ours = np.einsum("pw,bchw->bchp", m, ours)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# --- preprocessing ---------------------------------------------------------


def _rand_pil(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 256, size=(h, w), dtype=np.uint8), mode="L")


@pytest.mark.parametrize("width", [30, 50, 100, 101, 184, 185, 300, 777])
def test_chunking_matches_reference(width):
    """Golden test: numpy strided chunker == reference while-loop chunker."""
    cfg = PreprocessConfig()
    img = _rand_pil(width, 77, seed=width)
    line = resize_line(img, cfg)
    ours = normalize(chunk_line(line, cfg))  # (N, H, CW)

    # reference path: same resize, then while-loop chunker + normalize
    aspect = img.width / img.height
    new_w = max(50, int(48 * aspect))
    ref_img = img.resize((new_w, 48), Image.Resampling.BILINEAR)
    t = np.asarray(ref_img, np.float32) / 255.0  # (H, W)
    ref_chunks = np.stack([(c - 0.5) / 0.5 for c in chunk_image_ref(t)])

    assert ours.shape == ref_chunks.shape
    np.testing.assert_allclose(ours, ref_chunks, atol=1e-6)


def test_chunk_count_formula():
    cfg = PreprocessConfig()
    for w in range(1, 600):
        n_loop, start = 0, 0
        while start < w:
            n_loop += 1
            start += cfg.chunk_stride
        assert cfg.num_chunks(w) == n_loop, w


def test_bucketing():
    cfg = PreprocessConfig()
    pre = Preprocessor(cfg, RuntimeConfig(chunk_buckets=(1, 2, 4, 8)))
    imgs = [_rand_pil(w, 48, seed=w) for w in [60, 120, 300, 650]]
    batches = pre.prepare_batches(imgs)
    seen = {}
    for b in batches:
        assert b.bucket_n in (1, 2, 4, 8)
        assert (b.chunk_counts <= b.bucket_n).all()
        # default layout: uint8 LINES padded to the bucket width
        assert b.chunks.ndim == 3 and b.chunks.dtype == np.uint8
        assert b.chunks.shape[2] == (b.bucket_n - 1) * cfg.chunk_stride + cfg.chunk_width
        for pos, idx in enumerate(b.indices):
            seen[idx] = (b.bucket_n, int(b.chunk_counts[pos]))
    # widths 60->1 chunk, 120->2, 300->4, 650->8
    assert seen[0] == (1, 1)
    assert seen[1] == (2, 2)
    assert seen[2] == (4, 4)
    assert seen[3] == (8, 8)
    # padding chunks are pure white: uint8 255 on the uint8 transfer
    # path, 1.0 after normalization on the float path
    pre2 = Preprocessor(cfg, RuntimeConfig(chunk_buckets=(4,), transfer_lines=False))
    [b] = pre2.prepare_batches([imgs[0]])
    assert b.chunk_counts[0] == 1
    assert b.chunks.dtype == np.uint8 and b.chunks.ndim == 4
    np.testing.assert_allclose(b.chunks[0, 1:], 255)
    pre3 = Preprocessor(cfg, RuntimeConfig(chunk_buckets=(4,), transfer_uint8=False,
                                           transfer_lines=False))
    [bf] = pre3.prepare_batches([imgs[0]])
    np.testing.assert_allclose(bf.chunks[0, 1:], 1.0)
    # the uint8 payload + device-side normalize is bit-identical to the
    # host-normalized float path (every pixel sits on the uint8/255 grid)
    np.testing.assert_array_equal(
        (b.chunks.astype(np.float32) / 255.0 - 0.5) / 0.5, bf.chunks
    )
    # the LINES payload padding region is white and matches the bucket width
    pre4 = Preprocessor(cfg, RuntimeConfig(chunk_buckets=(4,)))
    [bl] = pre4.prepare_batches([imgs[0]])
    assert bl.chunks.shape == (1, 48, 3 * cfg.chunk_stride + cfg.chunk_width)
    np.testing.assert_allclose(bl.chunks[0][:, 60:], 255)


def test_deadline_flush_partial_buckets():
    """RuntimeConfig.flush_deadline_ms: buckets flush PARTIAL batches once
    their oldest line ages past the deadline (device work starts while prep
    still streams); every line still comes out exactly once, in valid static
    shapes, and contents match the no-deadline run line for line."""
    cfg = PreprocessConfig()
    imgs = [_rand_pil(60 + 85 * (i % 4), 48, seed=i) for i in range(24)]

    ref = {}
    for b in Preprocessor(cfg, RuntimeConfig(chunk_buckets=(1, 2, 4))).iter_batches(
            imgs, max_batch=256):
        for pos, idx in enumerate(b.indices):
            ref[idx] = (b.bucket_n, int(b.chunk_counts[pos]), b.chunks[pos])

    # a ~0 deadline flushes on (almost) every feed -> many partial batches
    pre = Preprocessor(cfg, RuntimeConfig(chunk_buckets=(1, 2, 4), flush_deadline_ms=1e-6))
    batches = list(pre.iter_batches(imgs, max_batch=256))
    assert len(batches) > 3  # partial flushes happened well before end-of-stream
    seen = {}
    for b in batches:
        assert len(b.indices) <= 256
        assert b.chunks.shape[0] == len(b.indices)
        for pos, idx in enumerate(b.indices):
            assert idx not in seen, "line emitted twice"
            seen[idx] = (b.bucket_n, int(b.chunk_counts[pos]), b.chunks[pos])
    assert set(seen) == set(range(len(imgs)))
    for idx, (bn, cc, payload) in ref.items():
        assert seen[idx][0] == bn and seen[idx][1] == cc
        np.testing.assert_array_equal(seen[idx][2], payload)

    # deadline off (default): behavior unchanged — one batch per bucket here
    again = list(Preprocessor(cfg, RuntimeConfig(chunk_buckets=(1, 2, 4))).iter_batches(
        imgs, max_batch=256))
    assert len(again) == len({b.bucket_n for b in again})


def test_device_chunking_parity():
    """The on-device strided chunker over the uint8 lines payload must be
    bit-identical to the host chunk_line + normalize path, including the
    white padding and the truncation-at-largest-bucket case."""
    import jax

    from khmer_ocr_tpu.infer.predictor import _device_chunk

    cfg = PreprocessConfig()
    rt_lines = RuntimeConfig(chunk_buckets=(1, 2, 4))
    rt_host = RuntimeConfig(chunk_buckets=(1, 2, 4), transfer_uint8=False, transfer_lines=False)
    # widths: sub-min, exact chunk, mid-bucket, exact bucket, past the largest
    # bucket (truncation)
    imgs = [_rand_pil(w, 37, seed=w) for w in [30, 100, 250, 352, 900]]
    chunker = jax.jit(_device_chunk, static_argnums=1)
    for img in imgs:
        [lines_b] = Preprocessor(cfg, rt_lines).prepare_batches([img])
        [host_b] = Preprocessor(cfg, rt_host).prepare_batches([img])
        lines = (lines_b.chunks.astype(np.float32) / 255.0 - 0.5) / 0.5
        dev = np.asarray(chunker(lines, (cfg.chunk_width, cfg.chunk_stride)))
        assert dev.shape == host_b.chunks.shape
        np.testing.assert_array_equal(dev, host_b.chunks)
        assert lines_b.bucket_n == host_b.bucket_n
        np.testing.assert_array_equal(lines_b.chunk_counts, host_b.chunk_counts)


def test_load_grayscale_variants(tmp_path):
    arr = np.random.RandomState(0).randint(0, 255, (20, 40), np.uint8)
    img = Image.fromarray(arr)
    p = tmp_path / "x.png"
    img.save(p)
    for src in [str(p), img, arr]:
        out = load_grayscale(src)
        assert out.mode == "L" and out.size == (40, 20)
