"""Per-image training augmentations (host-side numpy, matches the reference's
``ConsistentAugmenter``, CNN-Transformer.ipynb [cell 8]).

Operates on float32 (H, W) images in [0, 1] (white = 1.0), BEFORE
normalization — same contract as the reference. Randomness comes from a
``numpy.random.Generator`` so data workers are reproducible and independent.
Runs on host CPU inside the input pipeline (the reference runs it in DataLoader
worker processes); the TPU only ever sees the final static-shape batches.

Augmentations and probabilities (low-res input mode, the one the notebooks use):
  geometry (one of none/short/shrink, uniform choice), blur p=0.3 (sigma
  0.5-1.0, k=3 separable Gaussian), additive noise p=0.5 (sigma 0.02-0.08),
  horizontal shift p=0.5 (+-8 px); pixelate/erode are hi-res-only and therefore
  disabled by default, but implemented for the hi-res mode.
"""

from __future__ import annotations

import numpy as np
import cv2


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    # cv2 INTER_LINEAR matches torch F.interpolate(mode='bilinear',
    # align_corners=False) half-pixel sampling.
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


class Augmenter:
    def __init__(self, augment_prob: float = 0.8, is_low_res_input: bool = True, pad_value: float = 1.0):
        self.augment_prob = augment_prob
        self.is_low_res = is_low_res_input
        self.pad_value = pad_value

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() > self.augment_prob:
            return img
        h, w = img.shape

        geom_mode = rng.choice(["none", "short", "shrink"])
        scale_h = rng.uniform(0.7, 0.98)
        scale_all = rng.uniform(0.8, 0.98)
        do_pixelate = (not self.is_low_res) and rng.random() < 0.5
        do_blur = rng.random() < 0.3
        blur_sigma = rng.uniform(0.5, 1.0) if self.is_low_res else rng.uniform(1.0, 2.0)
        do_noise = rng.random() < 0.5
        noise_std = rng.uniform(0.02, 0.08)
        do_shift = rng.random() < 0.5
        shift_x = int(rng.integers(-8, 9))
        do_erode = (not self.is_low_res) and rng.random() < 0.2

        if geom_mode == "short":
            new_h = int(h * scale_h)
            if new_h < h:
                resized = _resize_bilinear(img, new_h, w)
                bg = np.full_like(img, self.pad_value)
                top = (h - new_h) // 2
                bg[top : top + new_h, :] = resized
                img = bg
        elif geom_mode == "shrink":
            new_h, new_w = int(h * scale_all), max(1, int(w * scale_all))
            if new_h < h:
                resized = _resize_bilinear(img, new_h, new_w)
                bg = np.full_like(img, self.pad_value)
                top, left = (h - new_h) // 2, (w - new_w) // 2
                if top + new_h <= h and left + new_w <= w:
                    bg[top : top + new_h, left : left + new_w] = resized
                    img = bg

        if do_pixelate:
            s = rng.uniform(0.4, 0.7)
            sh, sw = max(16, int(h * s)), max(4, int(w * s))
            img = _resize_bilinear(_resize_bilinear(img, sh, sw), h, w)

        if do_erode:
            # max-pool 3x3 on white-background text == erode black strokes
            eroded = cv2.dilate(img, np.ones((3, 3), np.uint8))
            t = rng.uniform(0.5, 0.8)
            img = img * (1 - t) + eroded * t

        if do_blur:
            k = 3
            x = np.arange(k, dtype=np.float32) - k // 2
            k1d = np.exp(-(x**2) / (2 * blur_sigma**2))
            k1d /= k1d.sum()
            img = cv2.sepFilter2D(img, -1, k1d, k1d, borderType=cv2.BORDER_CONSTANT)

        if do_noise:
            img = np.clip(img + rng.standard_normal(img.shape).astype(np.float32) * noise_std, 0.0, 1.0)

        if do_shift and shift_x != 0:
            shifted = np.full_like(img, self.pad_value)
            if 0 < shift_x < w:
                shifted[:, shift_x:] = img[:, :-shift_x]
            elif -w < shift_x < 0:
                shifted[:, :shift_x] = img[:, -shift_x:]
            img = shifted

        return img.astype(np.float32)
