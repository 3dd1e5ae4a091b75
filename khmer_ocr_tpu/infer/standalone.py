"""`KhmerOCRInference` — the standalone class API of the reference's HF-Hub
distribution (inference.py:36-295): construct with explicit model/vocab paths
and call `.predict(image, beam_width)` per line.

Differences from the packaged Predictor path, kept for parity with the
standalone variant where they matter:
  * `max_length` (decode cap) defaults to 128 here vs the packaged 256
    (inference.py:213 vs config.py:12 — a documented disagreement inside the
    reference itself; SURVEY.md §7 hard-parts #5).
  * Optional `binarize=True` applies Otsu-after-blur before resizing
    (the notebook's binarization eval variant, [cell 20]).
The packaged min-width floor (50) is used rather than the standalone's 10,
matching the published-CER configuration.
"""

from __future__ import annotations

import dataclasses

from ..config import OCRConfig, backbone_for_path
from .predictor import Predictor


class KhmerOCRInference:
    def __init__(self, model_path, char2idx_path=None, model_class=None, emb_dim: int = 384,
                 max_global_len: int = 4096, device=None, binarize: bool = False,
                 max_length: int = 128):
        # model_class/device accepted for signature parity; the backbone comes
        # from the checkpoint (or filename) and devices are managed by JAX.
        del model_class, device
        config = OCRConfig()
        config = config.replace(
            preprocess=dataclasses.replace(config.preprocess, binarize=binarize),
            model=config.model.replace(
                backbone=backbone_for_path(model_path), emb_dim=emb_dim, max_global_len=max_global_len,
            ),
        )
        self._predictor = Predictor(model_path=model_path, vocab_path=char2idx_path, config=config)
        self.max_length = max_length

    def predict(self, image_input, beam_width: int = 3) -> str:
        # decode cap 128 (standalone behavior, inference.py:213) passed as a
        # per-call override — no shared-config mutation, safe under concurrency
        return self._predictor.predict(image_input, beam_width=beam_width, max_len=self.max_length)

    def predict_batch(self, images, beam_width: int = 1, batch_size: int = 8):
        return self._predictor.predict_batch(images, beam_width=beam_width, batch_size=batch_size)
