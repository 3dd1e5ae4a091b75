"""Public recognition API with a cached singleton predictor.

Reference: recognize_text.py:29-131 — module-level predictor singleton,
``recognize`` / ``recognize_batch`` helpers, model-class-by-filename selection
(handled inside the converter here), and checkpoint shape auto-detection
(convert.detect_model_config).
"""

from __future__ import annotations

import logging
import threading

from ..config import OCRConfig
from .predictor import Predictor

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()  # the reference singleton is unguarded (SURVEY.md §5)
_PREDICTOR: Predictor | None = None
_PREDICTOR_KEY: tuple | None = None


def get_predictor(model_path=None, vocab_path=None, config: OCRConfig | None = None) -> Predictor:
    global _PREDICTOR, _PREDICTOR_KEY
    key = (str(model_path), str(vocab_path))
    with _LOCK:
        # model_path=None means "whatever is loaded" (the reference singleton
        # ignores later path args entirely, recognize_text.py:46-47; we reuse on
        # None but DO honor an explicit different path by reloading).
        if _PREDICTOR is not None and (model_path is None or _PREDICTOR_KEY == key):
            return _PREDICTOR
        if model_path is None:
            raise FileNotFoundError(
                "No model weights available. Pass model_path= (a reference .pth/.safetensors "
                "checkpoint or a native Orbax checkpoint directory)."
            )
        _PREDICTOR = Predictor(model_path=model_path, vocab_path=vocab_path, config=config)
        _PREDICTOR_KEY = key
        return _PREDICTOR


def reset_predictor() -> None:
    global _PREDICTOR, _PREDICTOR_KEY
    with _LOCK:
        _PREDICTOR, _PREDICTOR_KEY = None, None


def recognize(image_input, beam_width: int = 3, model_path=None, vocab_path=None) -> str:
    """Recognize text in one image (reference: recognize_text.py:69-90)."""
    predictor = get_predictor(model_path, vocab_path)
    try:
        return predictor.predict(image_input, beam_width=beam_width)
    except Exception:
        logger.exception("Prediction error")
        return ""


def recognize_batch(image_list, beam_width: int = 1, batch_size: int = 8, model_path=None, vocab_path=None):
    """Batched recognition; falls back to per-image on batch failure
    (reference: recognize_text.py:92-102)."""
    if not image_list:
        return []
    predictor = get_predictor(model_path, vocab_path)
    try:
        return predictor.predict_batch(image_list, beam_width=beam_width, batch_size=batch_size)
    except Exception:
        logger.exception("Batch prediction error; falling back to per-image")
        return [recognize(img, beam_width, model_path, vocab_path) for img in image_list]
