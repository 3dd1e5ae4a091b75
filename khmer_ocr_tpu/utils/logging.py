"""Logging setup (reference: netra_ocr/recognition/utils.py:7-12 — the rest of
the reference logs via print; here everything uses stdlib logging)."""

from __future__ import annotations

import logging


def setup_logging(level: int = logging.INFO) -> None:
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%H:%M:%S",
    )
