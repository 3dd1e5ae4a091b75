"""On-device line-image ops shared by serving and training.

The host ships whole uint8 LINES padded to a bucket width (preprocess.py
``PreparedBatch`` / train.data lines batches); everything downstream —
normalization, window extraction, training augmentation — runs inside the
jitted program on device. This is the TPU-first inversion of the reference's
host pipeline (CNN-Transformer.ipynb [cells 8-9] do augment+chunk+normalize in
DataLoader workers): the tunnel/host does O(bytes) work, the VPU does the math.
"""

from __future__ import annotations

import jax.numpy as jnp


def device_chunk(lines, chunk_geom: tuple[int, int]):
    """(B, H, Wb) lines -> (B, N, H, CW) windows on device: a static strided
    gather (N static slices XLA fuses into one cheap copy). Bit-identical to
    the host chunker ``preprocess.chunk_line`` — the host pads lines to the
    bucket width with white, so every window is fully in-bounds."""
    cw, stride = chunk_geom
    wb = lines.shape[2]
    n = (wb - cw) // stride + 1
    return jnp.stack([lines[:, :, i * stride : i * stride + cw] for i in range(n)], axis=1)


def u8_to_unit(x):
    """uint8 pixels -> float32 [0, 1] (exactly the host float path's values)."""
    return x.astype(jnp.float32) / 255.0


def unit_normalize(x):
    """[0, 1] -> [-1, 1] (the model's input normalization, preprocess.normalize)."""
    return (x - 0.5) / 0.5
