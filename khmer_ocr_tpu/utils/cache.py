"""Persistent XLA compilation cache.

The train step compiles once per (chunk-bucket, label-bucket) shape pair and
inference once per (bucket, batch, beam) — at ~1 min per TPU compile that
dominates short runs. The JAX persistent compilation cache makes every shape a
one-time cost across processes.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("KHMER_OCR_CACHE", "~/.cache/khmer_ocr_tpu")).expanduser()


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    import jax

    path = Path(cache_dir) if cache_dir else _DEFAULT / "xla_cache"
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax or unsupported backend — best effort
        pass
