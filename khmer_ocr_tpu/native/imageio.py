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
            lib.kh_resize_gray_mem.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i32p,
            ]
            lib.kh_resize_gray_mem.restype = ctypes.c_int
            lib.kh_resize_gray_mem_batch.argtypes = [
                ctypes.POINTER(u8p), i32p, i32p, i32p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i32p, i32p, ctypes.c_int,
            ]
            lib.kh_resize_gray_mem_batch.restype = None
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


def _as_mem_view(img: np.ndarray):
    """Validate/coerce one in-memory image to (contiguous-row uint8, h, w,
    channels, stride) or None if the native path can't take it."""
    if not isinstance(img, np.ndarray) or img.dtype != np.uint8 or img.ndim not in (2, 3):
        return None
    channels = 1 if img.ndim == 2 else img.shape[2]
    if channels not in (1, 3, 4):
        return None
    if img.ndim == 3 and channels == 1:
        img = img[:, :, 0]
    # rows must be dense (stride on the last axes == itemsize pattern); a
    # row-stride gap is fine — the C side takes stride in bytes
    if img.ndim == 2:
        if img.strides[1] != 1:
            img = np.ascontiguousarray(img)
    else:
        if img.strides[2] != 1 or img.strides[1] != channels:
            img = np.ascontiguousarray(img)
    h, w = img.shape[0], img.shape[1]
    if h <= 0 or w <= 0:
        return None
    return img, h, w, channels, img.strides[0]


def resize_gray_mem(img: np.ndarray, out_h: int = 48, min_w: int = 50, cap_w: int = 10768,
                    as_uint8: bool = False) -> np.ndarray | None:
    """Grayscale+resize one in-memory uint8 image (H, W[, C]) -> (out_h, W').

    Pillow-bit-exact with ``Image.fromarray(img).convert("L").resize(...,
    BILINEAR)``; None when the library is unavailable or the array shape/dtype
    isn't supported (caller falls back to PIL)."""
    lib = load_imageio_library()
    view = _as_mem_view(img)
    if lib is None or view is None:
        return None
    arr, h, w, channels, stride = view
    out = np.empty((out_h, cap_w), np.uint8)
    ow = ctypes.c_int32(0)
    rc = lib.kh_resize_gray_mem(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, channels, stride,
        out_h, min_w, cap_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(ow),
    )
    if rc != 0:
        return None
    keep = min(ow.value, cap_w)
    if as_uint8:
        return np.ascontiguousarray(out[:, :keep])
    return out[:, :keep].astype(np.float32) / 255.0


def resize_gray_mem_batch(images, out_h: int = 48, min_w: int = 50, cap_w: int = 10768,
                          n_threads: int = 0, out: np.ndarray | None = None):
    """Threaded batch grayscale+resize of in-memory crops (the detection->
    recognition feed). Returns (buf (n, out_h, cap_w) uint8, widths, errs) or
    None if the library is unavailable. Images whose dtype/shape the native
    path can't take get errs[i] != 0 (fall back to PIL for those)."""
    lib = load_imageio_library()
    if lib is None:
        return None
    n = len(images)
    if out is not None and out.shape[0] >= n and out.shape[1:] == (out_h, cap_w):
        bufs = out[:n]
    else:
        bufs = np.empty((n, out_h, cap_w), np.uint8)
    widths = np.zeros(n, np.int32)
    errs = np.zeros(n, np.int32)
    views = [_as_mem_view(img) for img in images]
    idx = [i for i, v in enumerate(views) if v is not None]
    for i, v in enumerate(views):
        if v is None:
            errs[i] = 2  # unsupported on the native path
    if idx:
        m = len(idx)
        keep = [views[i] for i in idx]  # hold coerced arrays alive through the call
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ptrs = (u8p * m)(*[k[0].ctypes.data_as(u8p) for k in keep])
        hs = np.array([k[1] for k in keep], np.int32)
        ws = np.array([k[2] for k in keep], np.int32)
        chs = np.array([k[3] for k in keep], np.int32)
        strides = np.array([k[4] for k in keep], np.int64)
        sub_bufs = np.empty((m, out_h, cap_w), np.uint8) if m != n else bufs
        sub_w = np.zeros(m, np.int32)
        sub_e = np.zeros(m, np.int32)
        lib.kh_resize_gray_mem_batch(
            ptrs,
            hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            chs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            strides.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            m, out_h, min_w, cap_w,
            sub_bufs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sub_w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sub_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        if m != n:
            for j, i in enumerate(idx):
                bufs[i] = sub_bufs[j]
                widths[i] = sub_w[j]
                errs[i] = sub_e[j]
        else:
            widths[:] = sub_w
            errs[:] = sub_e
    return bufs, widths, errs
