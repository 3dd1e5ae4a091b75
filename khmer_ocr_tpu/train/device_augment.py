"""On-device training augmentation: the reference's ``ConsistentAugmenter``
(CNN-Transformer.ipynb [cell 8], low-res mode) re-expressed as branchless,
statically-shaped JAX ops so it runs inside the jitted train step.

Why: the host Augmenter (train/augment.py, cv2) costs ~1 ms/image of host CPU;
one feeding core caps training at ~150-210 lines/s while the device step
sustains ~2000 (round-2 VERDICT weak #3). On device the same transforms are a
few fused VPU passes over the batch — host work drops to a uint8 memcpy.

Semantics vs the host/cv2 version (same distribution, not bit-equal):
  * geometry (none/short/shrink, uniform choice) — exact cv2.INTER_LINEAR
    half-pixel sampling re-expressed as an axis-aligned bilinear warp with a
    STATIC output shape (dynamic resize shapes can't live under jit); `shrink`
    centers on each line's TRUE width (passed per sample), so white bucket
    padding stays padding exactly as in the reference, which augments the
    natural-width line before chunk-padding.
  * blur p=0.3 — 3-tap separable Gaussian, sigma U(0.5, 1.0), zero border
    (cv2.sepFilter2D BORDER_CONSTANT), applied branchlessly: when inactive the
    sigma collapses the kernel to identity ([0, 1, 0]).
  * noise p=0.5 — additive N(0, sigma), sigma U(0.02, 0.08), masked to the
    true width (the reference adds noise before chunk-padding, so padding
    stays clean), clipped to [0, 1].
  * shift p=0.5 — integer horizontal shift U{-8..8}, white fill; expressed as
    a clamped gather so the shape stays static.
  * pixelate/erode are hi-res-only in the reference and the notebooks run
    low-res — not implemented here; use the host Augmenter for hi-res data.

RNG: per-sample keys split from one batch key; draws are independent of the
host Augmenter's numpy stream (augmentation is stochastic — distribution
parity is the contract, tests/test_device_augment.py checks the per-op math
against cv2 at fixed parameters).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_resample(img, src_coord, axis: int, n_valid=None):
    """Bilinear resample along one axis at traced coordinates (edge-clamped).

    ``src_coord``: (n_out,) fractional source coordinates for that axis.
    ``n_valid``: clamp limit (traced ok) — the true extent of the source along
    that axis (cv2 resizes the natural-width image, so sampling never reads the
    bucket padding). Implemented as two shared-index gathers + lerp —
    axis-aligned scaling separates, so a full 2D warp is two 1D passes.
    """
    n_src = img.shape[axis]
    if n_valid is None:
        n_valid = n_src
    c = jnp.clip(src_coord, 0.0, n_valid - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, jnp.maximum(n_valid - 2, 0))
    frac = c - i0
    lo = jnp.take(img, i0, axis=axis)
    hi = jnp.take(img, jnp.minimum(i0 + 1, n_valid - 1), axis=axis)
    shape = [1, 1]
    shape[axis] = c.shape[0]
    f = frac.reshape(shape)
    return lo * (1.0 - f) + hi * f


def _blur3(img, sigma):
    """3-tap separable Gaussian with ZERO border (cv2 BORDER_CONSTANT).

    sigma is traced; sigma -> 0 gives the identity kernel, which is how the
    p=0.3 gate stays branchless."""
    w_side = jnp.exp(-1.0 / (2.0 * sigma * sigma))
    k = jnp.stack([w_side, jnp.ones(()), w_side])
    k = k / jnp.sum(k)
    padded = jnp.pad(img, ((1, 1), (0, 0)))
    img = padded[:-2] * k[0] + padded[1:-1] * k[1] + padded[2:] * k[2]
    padded = jnp.pad(img, ((0, 0), (1, 1)))
    return padded[:, :-2] * k[0] + padded[:, 1:-1] * k[1] + padded[:, 2:] * k[2]


def _geometry(img, width, geom, scale_h, scale_all, pad_value):
    """none/short/shrink as ONE axis-aligned bilinear warp with static shape.

    geom: () int32 in {0 none, 1 short, 2 shrink}; scales traced floats.
    Matches the reference's resize-then-center-paste (train/augment.py:52-68)
    including the int() floors and cv2.INTER_LINEAR half-pixel sampling;
    `shrink` centers on the TRUE width, never the bucket padding."""
    h, wb = img.shape
    w = width.astype(jnp.float32)
    # int(h * scale) floors exactly like the reference
    new_h = jnp.where(geom == 1, jnp.floor(h * scale_h),
                      jnp.where(geom == 2, jnp.floor(h * scale_all), float(h)))
    new_w = jnp.where(geom == 2, jnp.maximum(1.0, jnp.floor(w * scale_all)), w)
    top = jnp.floor((h - new_h) / 2.0)
    left = jnp.where(geom == 2, jnp.floor((w - new_w) / 2.0), 0.0)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(wb, dtype=jnp.float32)
    # cv2.INTER_LINEAR half-pixel mapping of the pasted region back to source
    sy = (ys - top + 0.5) * (h / new_h) - 0.5
    sx = (xs - left + 0.5) * (w / new_w) - 0.5
    inside = ((ys >= top) & (ys < top + new_h))[:, None] & \
             ((xs >= left) & (xs < left + new_w))[None, :]
    warped = _axis_resample(_axis_resample(img, sy, 0), sx, 1, n_valid=width)
    return jnp.where(inside, warped, pad_value)


def _shift_x(img, shift, pad_value):
    """Integer horizontal shift with constant fill, static shape."""
    wb = img.shape[1]
    src_x = jnp.arange(wb, dtype=jnp.int32) - shift
    valid = (src_x >= 0) & (src_x < wb)
    return jnp.where(valid[None, :],
                     jnp.take(img, jnp.clip(src_x, 0, wb - 1), axis=1), pad_value)


def _augment_one(img, width, key, augment_prob: float, pad_value: float):
    """img: (H, Wb) float32 [0, 1]; width: () int32 true (unpadded) width."""
    h, wb = img.shape
    ks = jax.random.split(key, 10)
    original = img

    geom = jax.random.randint(ks[0], (), 0, 3)  # 0 none / 1 short / 2 shrink
    scale_h = jax.random.uniform(ks[1], (), minval=0.7, maxval=0.98)
    scale_all = jax.random.uniform(ks[2], (), minval=0.8, maxval=0.98)
    do_blur = jax.random.uniform(ks[3], ()) < 0.3
    blur_sigma = jax.random.uniform(ks[4], (), minval=0.5, maxval=1.0)
    do_noise = jax.random.uniform(ks[5], ()) < 0.5
    noise_std = jax.random.uniform(ks[6], (), minval=0.02, maxval=0.08)
    do_shift = jax.random.uniform(ks[7], ()) < 0.5
    shift_x = jax.random.randint(ks[8], (), -8, 9)

    img = _geometry(img, width, geom, scale_h, scale_all, pad_value)

    # -- blur (branchless: inactive -> sigma ~0 -> identity kernel) ----------
    sigma_eff = jnp.where(do_blur, blur_sigma, 0.05)
    img = _blur3(img, sigma_eff)

    # -- noise, masked to the true width so padding stays clean --------------
    xs = jnp.arange(wb, dtype=jnp.float32)
    noise = jax.random.normal(ks[9], img.shape) * noise_std
    noise = noise * do_noise * (xs[None, :] < width.astype(jnp.float32))
    img = jnp.clip(img + noise, 0.0, 1.0)

    img = _shift_x(img, jnp.where(do_shift, shift_x, 0), pad_value)

    do_aug = jax.random.uniform(jax.random.fold_in(key, 7919), ()) <= augment_prob
    return jnp.where(do_aug, img, original)


@partial(jax.jit, static_argnames=("augment_prob", "pad_value"))
def augment_lines(imgs, widths, key, augment_prob: float = 0.8, pad_value: float = 1.0):
    """Batch on-device augmentation.

    imgs: (B, H, Wb) float32 in [0, 1] (use ops.lines.u8_to_unit first);
    widths: (B,) int32 true widths; key: one PRNG key for the batch.
    Returns float32 (B, H, Wb) in [0, 1].
    """
    keys = jax.random.split(key, imgs.shape[0])
    fn = partial(_augment_one, augment_prob=augment_prob, pad_value=pad_value)
    return jax.vmap(fn)(imgs, widths, keys)
