"""Exact PyTorch ``AdaptiveAvgPool2d`` as two small matmuls.

The reference backbones end with ``AdaptiveAvgPool2d((2, 32))`` (se_model.py:61,
vgg_model.py:48, resnet_model.py:65). For the 48x100 chunk geometry the input is
(H'=3, W'=25), so the pool *upsamples* width 25 -> 32 with **overlapping** bins.
PyTorch bin semantics: ``start = floor(i * in / out)``, ``end = ceil((i+1) * in /
out)``, average over [start, end).

Because the bins are axis-separable, the pool is exactly ``A_h @ X @ A_w^T`` with
precomputed averaging matrices — a pair of tiny matmuls that XLA fuses into the
surrounding graph and runs on the MXU, instead of gather/scatter loops.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 matrix M with M[i, j] = 1/|bin_i| if j in bin_i."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = math.ceil((i + 1) * in_size / out_size)
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x, out_hw: tuple[int, int]):
    """x: (..., H, W, C) NHWC -> (..., out_h, out_w, C)."""
    h, w = x.shape[-3], x.shape[-2]
    ah = jnp.asarray(adaptive_pool_matrix(h, out_hw[0]), dtype=x.dtype)
    aw = jnp.asarray(adaptive_pool_matrix(w, out_hw[1]), dtype=x.dtype)
    # (..., H, W, C): contract H then W.
    x = jnp.einsum("oh,...hwc->...owc", ah, x)
    x = jnp.einsum("pw,...hwc->...hpc", aw, x)
    return x
