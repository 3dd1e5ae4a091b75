"""On-device augmentation (train/device_augment.py) vs the host cv2 Augmenter.

Per-op numeric parity at FIXED parameters (the RNG streams differ by design —
augmentation is stochastic; distribution parity is the contract) plus the
train-step integration: a lines-layout batch with augmentation off must
reproduce the host-chunked loss bit-for-bit.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from khmer_ocr_tpu.train.device_augment import (
    _blur3, _geometry, _shift_x, augment_lines,
)


def _rand_line(h=48, w=300, wb=352, seed=0):
    rng = np.random.RandomState(seed)
    img = np.full((h, wb), 1.0, np.float32)
    img[:, :w] = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    return img, w


def test_geometry_short_matches_cv2():
    img, w = _rand_line()
    h = img.shape[0]
    for scale_h in (0.7, 0.85, 0.97):
        new_h = int(h * scale_h)
        resized = cv2.resize(img[:, :w], (w, new_h), interpolation=cv2.INTER_LINEAR)
        expected = np.full_like(img, 1.0)
        top = (h - new_h) // 2
        expected[top : top + new_h, :w] = resized
        got = np.asarray(_geometry(jnp.asarray(img), jnp.int32(w), jnp.int32(1),
                                   jnp.float32(scale_h), jnp.float32(0.9), 1.0))
        np.testing.assert_allclose(got, expected, atol=5e-5)


def test_geometry_shrink_matches_cv2():
    img, w = _rand_line(seed=1)
    h = img.shape[0]
    for scale in (0.8, 0.9, 0.97):
        new_h, new_w = int(h * scale), max(1, int(w * scale))
        resized = cv2.resize(img[:, :w], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        expected = np.full_like(img, 1.0)
        top, left = (h - new_h) // 2, (w - new_w) // 2
        expected[top : top + new_h, left : left + new_w] = resized
        got = np.asarray(_geometry(jnp.asarray(img), jnp.int32(w), jnp.int32(2),
                                   jnp.float32(0.8), jnp.float32(scale), 1.0))
        np.testing.assert_allclose(got, expected, atol=5e-5)


def test_geometry_none_is_identity():
    img, w = _rand_line(seed=2)
    got = np.asarray(_geometry(jnp.asarray(img), jnp.int32(w), jnp.int32(0),
                               jnp.float32(0.7), jnp.float32(0.8), 1.0))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_blur_matches_cv2():
    img, _ = _rand_line(seed=3)
    for sigma in (0.5, 0.75, 1.0):
        x = np.arange(3, dtype=np.float32) - 1
        k1d = np.exp(-(x**2) / (2 * sigma**2))
        k1d /= k1d.sum()
        expected = cv2.sepFilter2D(img, -1, k1d, k1d, borderType=cv2.BORDER_CONSTANT)
        got = np.asarray(_blur3(jnp.asarray(img), jnp.float32(sigma)))
        np.testing.assert_allclose(got, expected, atol=5e-5)


def test_blur_identity_when_sigma_tiny():
    img, _ = _rand_line(seed=4)
    got = np.asarray(_blur3(jnp.asarray(img), jnp.float32(0.05)))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_shift_matches_reference():
    img, _ = _rand_line(seed=5)
    w = img.shape[1]
    for shift in (-8, -3, 0, 5, 8):
        expected = np.full_like(img, 1.0)
        if shift > 0:
            expected[:, shift:] = img[:, :-shift]
        elif shift < 0:
            expected[:, :shift] = img[:, -shift:]
        else:
            expected = img
        got = np.asarray(_shift_x(jnp.asarray(img), jnp.int32(shift), 1.0))
        np.testing.assert_allclose(got, expected, atol=0)


def test_augment_prob_zero_is_passthrough():
    img, w = _rand_line(seed=6)
    batch = jnp.asarray(img)[None]
    out = augment_lines(batch, jnp.asarray([w], jnp.int32), jax.random.PRNGKey(0),
                        augment_prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))


def test_augment_deterministic_and_varied():
    imgs = np.stack([_rand_line(seed=s)[0] for s in range(4)])
    widths = jnp.asarray([300] * 4, jnp.int32)
    key = jax.random.PRNGKey(7)
    a = np.asarray(augment_lines(jnp.asarray(imgs), widths, key, augment_prob=1.0))
    b = np.asarray(augment_lines(jnp.asarray(imgs), widths, key, augment_prob=1.0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(augment_lines(jnp.asarray(imgs), widths, jax.random.PRNGKey(8),
                                 augment_prob=1.0))
    assert not np.array_equal(a, c)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # per-sample keys: samples transformed independently
    assert not np.array_equal(a[0], a[1])


def test_lines_batch_loss_matches_chunks_batch():
    """Un-augmented lines layout through the device chunker must give the exact
    host-chunked loss (u8/255 == the host float path bit-for-bit)."""
    from khmer_ocr_tpu.config import ModelConfig, PreprocessConfig
    from khmer_ocr_tpu.models.ocr_model import init_model
    from khmer_ocr_tpu.preprocess import chunk_line, normalize
    from khmer_ocr_tpu.train.step import loss_fn

    pre = PreprocessConfig()
    cfg = ModelConfig(emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                      enc_ffn_dim=128, max_global_len=256, decode_max_len=16,
                      backbone="vgg", use_bilstm=False)
    params, stats = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, nb = 2, 2
    wb = (nb - 1) * pre.chunk_stride + pre.chunk_width
    lines_u8 = np.full((b, pre.img_height, wb), 255, np.uint8)
    widths = np.array([120, wb], np.int32)
    for i in range(b):
        lines_u8[i, :, : widths[i]] = rng.randint(0, 256, (pre.img_height, widths[i]))
    chunks = np.stack([
        normalize(chunk_line(lines_u8[i].astype(np.float32) / 255.0, pre, nb))
        for i in range(b)
    ])
    counts = np.array([pre.num_chunks(int(w)) for w in widths], np.int32)
    labels = np.array([[2, 5, 6, 3], [2, 7, 3, 0]], np.int32)
    key = jax.random.PRNGKey(1)
    geom = (pre.chunk_width, pre.chunk_stride)
    loss_lines, _ = loss_fn(params, stats,
                            {"lines": jnp.asarray(lines_u8), "widths": jnp.asarray(widths),
                             "chunk_counts": jnp.asarray(counts), "labels": jnp.asarray(labels)},
                            cfg, key, train=False, chunk_geom=geom, augment_prob=0.0)
    loss_chunks, _ = loss_fn(params, stats,
                             {"chunks": jnp.asarray(chunks), "chunk_counts": jnp.asarray(counts),
                              "labels": jnp.asarray(labels)},
                             cfg, key, train=False, chunk_geom=geom, augment_prob=0.0)
    np.testing.assert_array_equal(np.asarray(loss_lines), np.asarray(loss_chunks))


def test_train_step_lines_runs_and_learns():
    """A few augmented lines-mode steps must run and reduce loss on a tiny
    constant batch (smoke: gradients flow through the device-chunk path)."""
    import optax

    from khmer_ocr_tpu.config import ModelConfig, PreprocessConfig
    from khmer_ocr_tpu.train.step import init_train_state, make_optimizer, make_train_step

    pre = PreprocessConfig()
    cfg = ModelConfig(emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                      enc_ffn_dim=128, max_global_len=256, decode_max_len=16,
                      backbone="vgg", use_bilstm=False, dropout=0.0)
    opt = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, donate=False,
                           chunk_geom=(pre.chunk_width, pre.chunk_stride), augment_prob=0.5)
    rng = np.random.RandomState(3)
    wb = pre.chunk_width
    batch = {
        "lines": jnp.asarray(rng.randint(0, 256, (4, pre.img_height, wb), np.uint8)),
        "widths": jnp.asarray([wb] * 4, jnp.int32),
        "chunk_counts": jnp.asarray([1] * 4, jnp.int32),
        "labels": jnp.asarray([[2, 5, 3, 0]] * 4, np.int32),
    }
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(key, i), jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_line_dataset_device_augment_batches():
    """epoch_batches in device-augment mode yields uint8 lines batches with
    correct widths/counts, memoizes resized lines, and as_dict round-trips."""
    from khmer_ocr_tpu.train.data import LineDataset

    rng = np.random.RandomState(9)
    samples = [
        (np.full((40, 80 + 60 * i), 255 - i, np.uint8), f"t{i}") for i in range(6)
    ]
    ds = LineDataset(samples, device_augment=True)
    batches = list(ds.epoch_batches(2, np.random.default_rng(0), num_workers=2))
    assert batches and all(b.lines is not None for b in batches)
    total = 0
    for b in batches:
        assert b.lines.dtype == np.uint8 and b.lines.ndim == 3
        assert b.chunks is None
        assert (b.widths > 0).all() and (b.widths <= b.lines.shape[2]).all()
        d = b.as_dict()
        assert set(d) == {"lines", "widths", "chunk_counts", "labels"}
        total += len(b.texts)
    assert total >= len(samples)  # tail padding may repeat
    assert len(ds._line_cache) == len(samples)  # resize memoized across epochs
