"""ctypes wrapper for the native image loader (imageio.cpp).

Pillow-parity decode+grayscale+BILINEAR-resize in C++ with a thread-pool batch
API. `load_resize_gray` mirrors `preprocess.resize_line(load_grayscale(path))`
up to the final /255 normalization (bit-exact for PNG inputs — see imageio.cpp
header); callers fall back to the PIL path when the library or a decode is
unavailable (non-file inputs, exotic formats).
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

_SRC = Path(__file__).parent / "imageio.cpp"
_CACHE = Path(os.environ.get("KHMER_OCR_CACHE", "~/.cache/khmer_ocr_tpu")).expanduser() / "native"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def load_imageio_library() -> ctypes.CDLL | None:
    """Build (if needed) and load the image loader; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            src = _SRC.read_bytes()
            key = hashlib.sha256(src).hexdigest()[:16]
            so_path = _CACHE / f"khmer_ocr_imageio_{key}.so"
            if not so_path.exists():
                _CACHE.mkdir(parents=True, exist_ok=True)
                tmp = so_path.with_suffix(".build.so")
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                       str(_SRC), "-lpng", "-ljpeg", "-lz", "-o", str(tmp)]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                tmp.replace(so_path)
                logger.info("built native image loader %s", so_path.name)
            lib = ctypes.CDLL(str(so_path))
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.kh_load_resize_gray.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i32p,
            ]
            lib.kh_load_resize_gray.restype = ctypes.c_int
            lib.kh_load_resize_gray_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, u8p, i32p, i32p, ctypes.c_int,
            ]
            lib.kh_load_resize_gray_batch.restype = None
            _LIB = lib
        except Exception:
            logger.warning("native image loader unavailable; falling back to PIL", exc_info=True)
            _LIB_FAILED = True
        return _LIB


def load_resize_gray(path, out_h: int = 48, min_w: int = 50, cap_w: int = 10768,
                     as_uint8: bool = False) -> np.ndarray | None:
    """Decode+resize one image -> (out_h, W); None on failure.

    float32 in [0, 1] by default; ``as_uint8`` returns the raw uint8 pixels
    (the /255 float view is exactly uint8/255, so the uint8 form is the
    lossless transfer payload — preprocess.Preprocessor's lines path)."""
    lib = load_imageio_library()
    if lib is None:
        return None
    out = np.empty((out_h, cap_w), np.uint8)
    w = ctypes.c_int32(0)
    rc = lib.kh_load_resize_gray(
        str(path).encode(), out_h, min_w, cap_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(w),
    )
    if rc != 0:
        return None
    keep = min(w.value, cap_w)
    if as_uint8:
        return np.ascontiguousarray(out[:, :keep])
    return out[:, :keep].astype(np.float32) / 255.0


def load_resize_gray_batch(paths, out_h: int = 48, min_w: int = 50, cap_w: int = 10768,
                           n_threads: int = 0, out: np.ndarray | None = None):
    """Threaded batch decode+resize.

    Returns (buf (n, out_h, cap_w) uint8, widths (n,) int32, errs (n,) int32) or
    None if the library is unavailable. widths may exceed cap_w (the natural
    resized width); valid columns are min(width, cap_w). errs[i] != 0 means
    image i failed (fall back to PIL for it).

    ``out``: optional preallocated (>=n, out_h, cap_w) uint8 buffer to decode
    into (a view of its first n rows is returned). Reusing one slab buffer
    across calls avoids first-touch page faults on large fresh allocations —
    the C++ writes only the first ``widths[i]`` columns of each row, and
    callers must read only those, so stale contents are harmless.
    """
    lib = load_imageio_library()
    if lib is None:
        return None
    n = len(paths)
    if out is not None and out.shape[0] >= n and out.shape[1:] == (out_h, cap_w):
        bufs = out[:n]
    else:
        bufs = np.empty((n, out_h, cap_w), np.uint8)
    widths = np.zeros(n, np.int32)
    errs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.kh_load_resize_gray_batch(
        arr, n, out_h, min_w, cap_w,
        bufs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return bufs, widths, errs
