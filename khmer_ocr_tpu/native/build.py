"""On-demand g++ build + ctypes loading of the native kernels.

No pybind11 in this image (per environment constraints), so the C++ side
exposes a plain C ABI and Python marshals numpy arrays through ctypes. The
shared object is compiled once into the user cache dir, keyed by a hash of the
source, and rebuilt automatically when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "levenshtein.cpp"
_CACHE = Path(os.environ.get("KHMER_OCR_CACHE", "~/.cache/khmer_ocr_tpu")).expanduser() / "native"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def load_native_library() -> ctypes.CDLL | None:
    """Build (if needed) and load the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            src = _SRC.read_bytes()
            key = hashlib.sha256(src).hexdigest()[:16]
            so_path = _CACHE / f"khmer_ocr_native_{key}.so"
            if not so_path.exists():
                _CACHE.mkdir(parents=True, exist_ok=True)
                tmp = so_path.with_suffix(".build.so")
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                       str(_SRC), "-o", str(tmp)]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                tmp.replace(so_path)
                logger.info("built native library %s", so_path.name)
            lib = ctypes.CDLL(str(so_path))
            lib.levenshtein_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            lib.levenshtein_batch.restype = None
            _LIB = lib
        except Exception:
            logger.warning("native library unavailable; falling back to numpy", exc_info=True)
            _LIB_FAILED = True
        return _LIB


def _pack(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(strings) + 1, np.int64)
    arrays = []
    for i, s in enumerate(strings):
        a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        arrays.append(a)
        offsets[i + 1] = offsets[i] + a.size
    data = np.concatenate(arrays) if arrays else np.zeros(0, np.uint32)
    return np.ascontiguousarray(data), offsets


def levenshtein_batch(refs: list[str], hyps: list[str], num_threads: int = 0) -> np.ndarray:
    """Batch edit distances; uses the C++ kernel when available, else the
    vectorized numpy DP from metrics.py."""
    assert len(refs) == len(hyps)
    n = len(refs)
    if n == 0:
        return np.zeros(0, np.int64)
    lib = load_native_library()
    if lib is None:
        from ..metrics import levenshtein

        return np.array([levenshtein(r, h) for r, h in zip(refs, hyps)], np.int64)
    rdata, roff = _pack(refs)
    hdata, hoff = _pack(hyps)
    out = np.zeros(n, np.int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.levenshtein_batch(
        rdata.ctypes.data_as(u32p), roff.ctypes.data_as(i64p),
        hdata.ctypes.data_as(u32p), hoff.ctypes.data_as(i64p),
        ctypes.c_int64(n), out.ctypes.data_as(i64p), ctypes.c_int64(num_threads),
    )
    return out
