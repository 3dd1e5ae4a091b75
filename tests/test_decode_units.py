"""Unit tests for decode helpers."""

from khmer_ocr_tpu.models.ocr_model import decode_windows


def test_decode_windows_schedule():
    assert decode_windows(256) == (32, 64, 128, 256)
    assert decode_windows(64) == (32, 64)
    assert decode_windows(32) == (32,)
    assert decode_windows(24) == (24,)  # max_len below the base window
    assert decode_windows(100) == (32, 64, 100)
