"""Native C++ image loader: Pillow-bit-exact decode+grayscale+resize parity
(reference host path: netra_ocr/recognition/preprocessor.py:38-48)."""

import numpy as np
import pytest
from PIL import Image

from khmer_ocr_tpu.config import PreprocessConfig
from khmer_ocr_tpu.native.imageio import (load_imageio_library, load_resize_gray,
                                          load_resize_gray_batch)
from khmer_ocr_tpu.preprocess import Preprocessor, load_grayscale, resize_line

pytestmark = pytest.mark.skipif(load_imageio_library() is None,
                                reason="native image loader unavailable")


def _pil_reference(img: Image.Image, min_w=50, out_h=48) -> np.ndarray:
    gray = img.convert("L")
    new_w = max(min_w, int(out_h * gray.width / gray.height))
    return np.asarray(gray.resize((new_w, out_h), Image.Resampling.BILINEAR), np.float32) / 255.0


@pytest.mark.parametrize("shape,mode", [
    ((60, 300), "L"), ((37, 511), "L"), ((100, 80), "RGB"), ((48, 200), "L"),
    ((13, 40), "RGB"), ((97, 977), "L"), ((200, 31), "L"),
])
def test_png_bit_exact_vs_pil(tmp_path, shape, mode):
    rng = np.random.RandomState(hash(shape) % 2**31)
    h, w = shape
    arr = rng.randint(0, 256, (h, w, 3) if mode == "RGB" else (h, w), np.uint8)
    img = Image.fromarray(arr, mode)
    p = tmp_path / "x.png"
    img.save(p)
    ref = _pil_reference(img)
    got = load_resize_gray(p)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_palette_png_bit_exact(tmp_path):
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 256, (40, 120, 3), np.uint8)).convert(
        "P", palette=Image.Palette.ADAPTIVE)
    p = tmp_path / "pal.png"
    img.save(p)
    # PIL reference decodes the SAVED file (palette round trip)
    ref = _pil_reference(Image.open(p))
    got = load_resize_gray(p)
    np.testing.assert_array_equal(got, ref)


def test_width_cap_matches_truncated_full_resize(tmp_path):
    """Capped evaluation == full resize then column truncation (per-column
    independence of the resample passes)."""
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (30, 4000), np.uint8)
    p = tmp_path / "wide.png"
    Image.fromarray(arr, "L").save(p)
    ref = _pil_reference(Image.open(p))
    cap = 500
    got = load_resize_gray(p, cap_w=cap)
    assert got.shape == (48, cap)
    np.testing.assert_array_equal(got, ref[:, :cap])


def test_jpeg_close_to_pil(tmp_path):
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, (64, 256, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=90)
    ref = _pil_reference(Image.open(p))
    got = load_resize_gray(p)
    assert got is not None and got.shape == ref.shape
    # Pillow bundles its own libjpeg-turbo; allow +-2/255 decoder drift
    assert np.abs(got - ref).max() <= 2.5 / 255.0


def test_batch_api_and_errors(tmp_path):
    rng = np.random.RandomState(4)
    paths = []
    for i in range(5):
        arr = rng.randint(0, 256, (40 + i, 150 + 17 * i), np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(arr, "L").save(p)
        paths.append(p)
    paths.append(tmp_path / "missing.png")
    bufs, widths, errs = load_resize_gray_batch(paths, cap_w=600, n_threads=3)
    assert errs[:5].sum() == 0 and errs[5] != 0
    for i, p in enumerate(paths[:5]):
        ref = _pil_reference(Image.open(p))
        keep = min(widths[i], 600)
        assert keep == ref.shape[1]
        np.testing.assert_array_equal(bufs[i, :, :keep].astype(np.float32) / 255.0, ref)


def test_preprocessor_native_path_matches_pil(tmp_path):
    """The Preprocessor fast path produces the same chunks as the PIL path."""
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (51, 777), np.uint8)
    p = tmp_path / "line.png"
    Image.fromarray(arr, "L").save(p)
    pre = Preprocessor()
    bucket_n, n, chunks = pre._prepare_one(str(p))
    cfg = PreprocessConfig()
    line = resize_line(load_grayscale(str(p)), cfg)
    from khmer_ocr_tpu.preprocess import bucket_for, chunk_line, normalize

    n_ref = min(cfg.num_chunks(line.shape[1]), pre.runtime.chunk_buckets[-1])
    assert (bucket_n, n) == (bucket_for(n_ref, pre.runtime.chunk_buckets), n_ref)
    # default transfer is a uint8 LINE padded to the bucket width (the device
    # normalizes and window-extracts); re-chunking it on host must match the
    # full PIL float path exactly
    assert chunks.dtype == np.uint8 and chunks.ndim == 2
    np.testing.assert_array_equal(
        normalize(chunk_line(chunks.astype(np.float32) / 255.0, cfg, bucket_n)),
        normalize(chunk_line(line, cfg, bucket_n)))
    # pre-chunked uint8 layout (transfer_lines off) matches too
    from khmer_ocr_tpu.config import RuntimeConfig
    pre2 = Preprocessor(runtime=RuntimeConfig(transfer_lines=False))
    bucket_n2, n2, chunks2 = pre2._prepare_one(str(p))
    assert (bucket_n2, n2) == (bucket_n, n) and chunks2.ndim == 3
    np.testing.assert_array_equal(
        (chunks2.astype(np.float32) / 255.0 - 0.5) / 0.5,
        normalize(chunk_line(line, cfg, bucket_n)))


def test_preprocessor_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        Preprocessor()._prepare_one("/nonexistent/file.png")


# ---------------------------------------------------------------------------
# Crops-from-memory entry point (kh_resize_gray_mem; round-3 priority #3):
# detection emits PIL/numpy crops — the recognition feed must hit the native
# resize without a file round-trip, bit-exact with the PIL path.
# ---------------------------------------------------------------------------

from khmer_ocr_tpu.native.imageio import resize_gray_mem, resize_gray_mem_batch  # noqa: E402


@pytest.mark.parametrize("shape,mode", [
    ((60, 300), "L"), ((37, 511), "RGB"), ((100, 80), "RGBA"),
    ((13, 40), "L"), ((97, 977), "RGB"), ((200, 31), "L"), ((48, 100), "L"),
])
def test_mem_resize_bit_exact_vs_pil(shape, mode):
    rng = np.random.RandomState(hash((shape, mode)) % 2**31)
    h, w = shape
    ch = {"L": (), "RGB": (3,), "RGBA": (4,)}[mode]
    arr = rng.randint(0, 256, (h, w, *ch), np.uint8)
    ref = _pil_reference(Image.fromarray(arr, mode))
    got = resize_gray_mem(arr)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_mem_resize_noncontiguous_rows():
    rng = np.random.RandomState(7)
    big = rng.randint(0, 256, (50, 400), np.uint8)
    view = big[5:45, 30:330]  # row-stride gap: a crop window, the real use case
    assert not view.flags["C_CONTIGUOUS"]
    ref = _pil_reference(Image.fromarray(np.ascontiguousarray(view), "L"))
    np.testing.assert_array_equal(resize_gray_mem(view), ref)


def test_mem_batch_parity_and_errors():
    rng = np.random.RandomState(11)
    imgs = [
        rng.randint(0, 256, (40, 200), np.uint8),
        rng.randint(0, 256, (60, 90, 3), np.uint8),
        np.zeros((30, 50), np.float32),  # wrong dtype -> errs != 0
        rng.randint(0, 256, (25, 600), np.uint8),
    ]
    out = resize_gray_mem_batch(imgs, n_threads=2)
    assert out is not None
    bufs, widths, errs = out
    assert errs[2] != 0 and all(errs[i] == 0 for i in (0, 1, 3))
    for i in (0, 1, 3):
        img = imgs[i]
        mode = "L" if img.ndim == 2 else "RGB"
        ref = _pil_reference(Image.fromarray(img, mode))
        keep = min(int(widths[i]), bufs.shape[2])
        np.testing.assert_array_equal(bufs[i, :, :keep].astype(np.float32) / 255.0, ref)


def test_preprocessor_mem_crop_matches_pil_everywhere():
    """The full prepare path on in-memory crops (uint8 array, PIL L, PIL RGB)
    must equal the PIL fallback bit-for-bit — both payload layouts."""
    rng = np.random.RandomState(23)
    crop = rng.randint(0, 256, (33, 340), np.uint8)
    sources = [crop, Image.fromarray(crop, "L"),
               Image.fromarray(np.stack([crop] * 3, -1), "RGB")]
    pre = Preprocessor(PreprocessConfig())
    for src in sources:
        native_f = pre._load_line(src)
        native_u8 = pre._load_line_u8(src)
        ref = resize_line(load_grayscale(src), pre.cfg)
        np.testing.assert_array_equal(native_f, ref)
        np.testing.assert_array_equal(native_u8.astype(np.float32) / 255.0, ref)
