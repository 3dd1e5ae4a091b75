"""Surya text-line detection wrapper (host-side third-party model).

Reference: netra_ocr/textline_detection.py:7-79. Surya's detector stays a
host-side dependency by design (SURVEY.md §2.4): it feeds line crops to the
TPU-resident recognizer. Import is gated — environments without `surya-ocr`
raise a clear error only when this engine is actually requested.

Improvement over the reference: the DetectionPredictor is constructed ONCE and
cached (the reference re-instantiates it per call, textline_detection.py:58 —
a known inefficiency flagged in SURVEY.md §3.1).
"""

from __future__ import annotations

from PIL import Image

_PREDICTOR = None


def _get_surya_predictor():
    global _PREDICTOR
    if _PREDICTOR is None:
        try:
            from surya.detection import DetectionPredictor
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "surya-ocr is not installed; use engine='custom' (SegFormer) or "
                "pip install surya-ocr for the surya text-line engine"
            ) from e
        _PREDICTOR = DetectionPredictor()
    return _PREDICTOR


def extract_textline_crops(image: Image.Image, prediction, expansion_px: int = 0, padding_px: int = 0):
    """Polygon -> bbox, expand, crop, white-pad, sort top-to-bottom
    (reference textline_detection.py:7-53)."""
    crops = []
    w, h = image.size
    for line in prediction.bboxes:
        x1, y1, x2, y2 = (int(v) for v in line.bbox)
        x1, y1 = max(0, x1 - expansion_px), max(0, y1 - expansion_px)
        x2, y2 = min(w, x2 + expansion_px), min(h, y2 + expansion_px)
        if x2 <= x1 or y2 <= y1:
            continue
        crop = image.crop((x1, y1, x2, y2))
        if padding_px > 0:
            padded = Image.new("RGB", (crop.width + 2 * padding_px, crop.height + 2 * padding_px), "white")
            padded.paste(crop, (padding_px, padding_px))
            crop = padded
        crops.append((crop, (x1, y1, x2, y2)))
    crops.sort(key=lambda item: item[1][1])  # top-to-bottom by y1
    return crops


def run_textline_detector(image_source, expansion_px: int = 0, padding_px: int = 0):
    """Returns (sorted [(PIL crop, bbox)], raw surya prediction)
    (reference textline_detection.py:56-79)."""
    image = image_source if isinstance(image_source, Image.Image) else Image.open(image_source)
    image = image.convert("RGB")
    predictor = _get_surya_predictor()
    prediction = predictor([image])[0]
    return extract_textline_crops(image, prediction, expansion_px, padding_px), prediction
