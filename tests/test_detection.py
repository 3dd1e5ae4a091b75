"""Detection subsystem tests: SegFormer numerical parity (subprocess torch
oracle) and CV post-processing behavior on synthetic documents."""

import hashlib
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.detection.config import LayoutConfig
from khmer_ocr_tpu.detection.postprocess import (
    classify_text_vs_picture,
    extract_layout_elements,
    intersection_over_smaller,
    is_graphical_line,
    snap_to_ink,
    suppress_overlapping_boxes,
)
from khmer_ocr_tpu.detection.preprocess import prepare_image
from khmer_ocr_tpu.detection.segformer import (
    SegFormerConfig,
    convert_hf_state_dict,
    predict_maps,
    segformer_logits,
)

HERE = Path(__file__).parent
CACHE = HERE / "_oracle_cache"


@pytest.fixture(scope="module")
def oracle():
    CACHE.mkdir(exist_ok=True)
    key = hashlib.sha256((HERE / "segformer_oracle_dump.py").read_bytes()).hexdigest()[:12]
    path = CACHE / f"segformer-{key}.npz"
    if not path.exists():
        subprocess.run(
            [sys.executable, str(HERE / "segformer_oracle_dump.py"), str(path)],
            check=True, cwd=HERE, timeout=600,
        )
    return dict(np.load(path, allow_pickle=False))


def test_segformer_logits_parity(oracle):
    sd = {k[3:]: v for k, v in oracle.items() if k.startswith("sd/")}
    params = convert_hf_state_dict(sd)
    cfg = SegFormerConfig()
    x = oracle["x"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    with jax.default_matmul_precision("highest"):
        fn = jax.jit(lambda p, xx: segformer_logits(p, xx, cfg))
        ours = np.asarray(fn(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, oracle["logits"], atol=2e-3, rtol=1e-3)


def test_segformer_upsampled_maps_parity(oracle):
    sd = {k[3:]: v for k, v in oracle.items() if k.startswith("sd/")}
    params = convert_hf_state_dict(sd)
    cfg = SegFormerConfig()
    x = oracle["x"].transpose(0, 2, 3, 1)
    with jax.default_matmul_precision("highest"):
        fn = jax.jit(lambda p, xx: predict_maps(p, xx, cfg, (97, 113)))
        class_map, heatmap = fn(params, jnp.asarray(x))
    ref_up = oracle["upsampled"][0]  # (12, 97, 113)
    ref_classes = np.argmax(ref_up, axis=0)
    agree = (np.asarray(class_map[0]) == ref_classes).mean()
    assert agree > 0.999, f"class map agreement {agree}"
    e = np.exp(ref_up - ref_up.max(axis=0, keepdims=True))
    ref_heat = (e / e.sum(axis=0)).max(axis=0)
    np.testing.assert_allclose(np.asarray(heatmap[0]), ref_heat, atol=2e-3)


def test_prepare_image_normalization():
    img = Image.fromarray(np.full((30, 40, 3), 255, np.uint8))
    _, pixels, size = prepare_image(img, 64)
    assert size == (40, 30)
    assert pixels.shape == (1, 64, 64, 3)
    # white pixel: (1.0 - mean) / std
    np.testing.assert_allclose(pixels[0, 0, 0], (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]), atol=1e-5)


# --- CV post-processing ------------------------------------------------------


def test_ios_and_suppression():
    a = [0, 0, 100, 100]
    inner = [10, 10, 50, 50]
    assert intersection_over_smaller(a, inner) == 1.0
    assert intersection_over_smaller(a, [200, 200, 300, 300]) == 0.0
    kept = suppress_overlapping_boxes([(a, 10), (inner, 10), ([200, 0, 260, 40], 7)], 0.7)
    assert len(kept) == 2
    assert kept[0][0] == [0, 0, 100, 100]  # inner absorbed into outer


def test_graphical_line_detection():
    solid_line = np.full((4, 400), 255, np.uint8)
    assert is_graphical_line(solid_line, LayoutConfig())
    text_like = np.zeros((40, 300), np.uint8)
    text_like[10:30, ::3] = 255
    assert not is_graphical_line(text_like, LayoutConfig())


def test_classify_text_vs_picture():
    # wide multi-blob single line -> text
    line = np.zeros((30, 200), np.uint8)
    for x0 in range(10, 190, 20):
        line[8:22, x0 : x0 + 10] = 255
    assert classify_text_vs_picture(line) == "text"
    # dense square blob -> picture
    blob = np.full((100, 110), 255, np.uint8)
    assert classify_text_vs_picture(blob) == "picture"


def _synthetic_page():
    """White page with two black text-ish lines and a dense picture block."""
    rng = np.random.RandomState(0)
    page = np.full((400, 600), 255, np.uint8)
    for x0 in range(50, 400, 18):  # line 1 ~y 60-80
        page[60:80, x0 : x0 + 10] = 0
    for x0 in range(50, 500, 18):  # line 2 ~y 120-145
        page[120:145, x0 : x0 + 10] = 0
    # picture: solid dark block (dense ink, aspect < 2 -> 'picture' under the
    # reference's content heuristics; noise would classify as text: many blobs)
    page[220:360, 80:300] = 40
    return page


def test_snap_to_ink_expands_and_tightens():
    page = _synthetic_page()
    cfg = LayoutConfig()
    # start with a box covering only the middle of line 1
    box, is_line = snap_to_ink(page, [150, 58, 250, 82], cfg)
    assert not is_line and box is not None
    x1, y1, x2, y2 = box
    assert x1 <= 50 + cfg.padding and x2 >= 400  # expanded to full ink extent
    assert y1 >= 50 and y2 <= 90  # tight vertically
    # empty region -> None
    box, _ = snap_to_ink(page, [480, 300, 560, 380], cfg)
    assert box is None


def test_extract_layout_end_to_end():
    page = _synthetic_page()
    image = Image.fromarray(page)
    h, w = page.shape
    class_map = np.zeros((h, w), np.int32)
    heatmap = np.zeros((h, w), np.float32)
    class_map[55:85, 45:420] = 10  # Text
    heatmap[55:85, 45:420] = 0.9
    class_map[115:150, 45:520] = 10
    heatmap[115:150, 45:520] = 0.85
    class_map[215:365, 75:305] = 7  # Picture
    heatmap[215:365, 75:305] = 0.8
    crops, elements = extract_layout_elements(image, class_map, heatmap)
    classes = sorted(cls for _, cls in elements)
    assert len(elements) == 3, elements
    assert classes == [7, 10, 10]
    assert len(crops) == 3
    # text boxes snapped to ink: line 1 spans ~[50-pad, 410+pad]
    text_boxes = [b for b, c in elements if c == 10]
    assert any(b[0] <= 50 and b[2] >= 400 for b in text_boxes)


def test_layout_inference_size_buckets(oracle):
    """predict_maps: device upsample to a 256-rounded bucket, host resize to the
    exact page size — maps must come back at the original resolution."""
    from khmer_ocr_tpu.detection.config import LayoutConfig
    from khmer_ocr_tpu.detection.detector import LayoutInference
    from khmer_ocr_tpu.detection.segformer import SegFormerConfig

    sd = {k[3:]: v for k, v in oracle.items() if k.startswith("sd/")}
    from khmer_ocr_tpu.detection.segformer import convert_hf_state_dict

    params = convert_hf_state_dict(sd)
    det = LayoutInference(model_dir=None, params=params, seg_cfg=SegFormerConfig(),
                          config=LayoutConfig(image_size=128))
    page = Image.fromarray(np.full((333, 205, 3), 255, np.uint8))
    img, cm, hm = det.predict_maps(page)
    assert cm.shape == (333, 205) and hm.shape == (333, 205)
    assert cm.dtype == np.int32 and 0.0 <= hm.max() <= 1.0001

    # the default packed-uint8 transfer must match the exact int32+f32 path:
    # class ids exactly, heatmap within its 1/255 quantization step
    det_exact = LayoutInference(model_dir=None, params=params, seg_cfg=SegFormerConfig(),
                                config=LayoutConfig(image_size=128, exact_maps=True))
    _, cm_e, hm_e = det_exact.predict_maps(page)
    assert cm_e.dtype == np.int32 and hm_e.dtype == np.float32
    np.testing.assert_array_equal(cm, cm_e)
    np.testing.assert_allclose(hm, hm_e, atol=0.5 / 255 + 1e-6)


def test_predict_maps_batch_matches_per_page(oracle):
    """Batched model-resolution transfer (predict_maps_batch): maps come back
    at each page's own size, class maps agree with the per-page path over
    nearly all pixels (boundary rows may shift a few px — the documented
    semantics difference), and mixed page sizes share ONE compiled program."""
    from khmer_ocr_tpu.detection.config import LayoutConfig
    from khmer_ocr_tpu.detection.detector import LayoutInference
    from khmer_ocr_tpu.detection.segformer import SegFormerConfig, convert_hf_state_dict

    sd = {k[3:]: v for k, v in oracle.items() if k.startswith("sd/")}
    params = convert_hf_state_dict(sd)
    det = LayoutInference(model_dir=None, params=params, seg_cfg=SegFormerConfig(),
                          config=LayoutConfig(image_size=128))
    rng = np.random.RandomState(0)
    pages = [Image.fromarray(rng.randint(200, 256, (h, w, 3), np.uint8))
             for h, w in [(333, 205), (180, 260), (333, 205)]]
    out = det.predict_maps_batch(pages, group=2)  # 3 pages -> group of 2 + padded 1
    assert len(out) == 3
    for (img, cm, hm), page in zip(out, pages):
        assert cm.shape == (page.height, page.width)
        assert hm.shape == (page.height, page.width)
        assert cm.dtype == np.int32 and 0.0 <= hm.max() <= 1.0001
        _, cm_pp, hm_pp = det.predict_maps(page)
        agree = (cm == cm_pp).mean()
        assert agree > 0.95, f"class maps diverged: {agree:.3f}"
        assert abs(float(hm.mean()) - float(hm_pp.mean())) < 0.05
