"""SegFormer layout-model training: init/forward compatibility, learning, and
loss semantics (reference gap: the layout model ships fine-tuned with no
training code, netra_ocr/detection/model.py:6-14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from khmer_ocr_tpu.detection.segformer import SegFormerConfig, predict_maps, segformer_logits
from khmer_ocr_tpu.detection.train import (IGNORE_INDEX, finetune, flatten_params, make_train_step,
                                           segformer_init, segformer_loss, synth_layout_batch,
                                           unflatten_params)

TINY = SegFormerConfig(
    num_labels=12, depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 24, 32),
    num_heads=(1, 2, 3, 4), sr_ratios=(8, 4, 2, 1), mlp_ratio=2, decoder_hidden=16,
)


def test_init_forward_shapes():
    """Random-init params run through the same inference path HF weights use."""
    params = segformer_init(jax.random.PRNGKey(0), TINY)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits = jax.jit(lambda p, x: segformer_logits(p, x, TINY))(params, x)
    assert logits.shape == (2, 16, 16, 12)
    cls_map, heat = predict_maps(params, x, TINY, (64, 64))
    assert cls_map.shape == (2, 64, 64) and heat.shape == (2, 64, 64)
    assert np.all(np.asarray(heat) <= 1.0 + 1e-6)


def test_train_step_overfits_fixed_batch():
    import optax

    params = segformer_init(jax.random.PRNGKey(1), TINY)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(TINY, optimizer)
    rng = np.random.RandomState(0)
    images, labels = synth_layout_batch(rng, batch=2, size=64, max_regions=2)
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    first = None
    bn_before = np.asarray(params["head"]["bn"]["mean"]).copy()
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, images, labels)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < 0.5 * first, f"no learning: {first} -> {float(loss)}"
    # BN running stats are state, not weights — they must track batch stats
    assert not np.allclose(np.asarray(params["head"]["bn"]["mean"]), bn_before)


def test_loss_ignore_index():
    params = segformer_init(jax.random.PRNGKey(2), TINY)
    images = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    all_ignored = jnp.full((1, 64, 64), IGNORE_INDEX, jnp.int32)
    loss, _ = segformer_loss(params, images, all_ignored, TINY)
    assert float(loss) == 0.0
    grads, _ = jax.grad(lambda p: segformer_loss(p, images, all_ignored, TINY), has_aux=True)(params)
    flat = flatten_params(grads)
    assert all(np.all(np.isfinite(v)) for v in flat.values())


def test_finetune_runs_and_save_roundtrip(tmp_path):
    params, losses = finetune(cfg=TINY, steps=4, batch_size=1, image_size=64, lr=1e-3, seed=3)
    assert len(losses) == 4 and all(np.isfinite(l) for l in losses)
    flat = flatten_params(params)
    out = tmp_path / "layout.npz"
    np.savez(out, **flat)
    loaded = dict(np.load(out))
    rebuilt = unflatten_params(loaded, params)
    for k, v in flatten_params(rebuilt).items():
        np.testing.assert_array_equal(v, flat[k])


def test_synth_layout_batch_labels_valid():
    rng = np.random.RandomState(7)
    images, labels = synth_layout_batch(rng, batch=3, size=128)
    assert images.shape == (3, 128, 128, 3) and labels.shape == (3, 128, 128)
    assert images.min() >= -1.0 - 1e-6 and images.max() <= 1.0 + 1e-6
    assert set(np.unique(labels)) <= {0, 7, 8, 9, 10, 11}
