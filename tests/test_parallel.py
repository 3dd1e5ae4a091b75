"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
the standard JAX substitute for real multi-chip testing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig, TrainConfig
from khmer_ocr_tpu.parallel.mesh import batch_sharding, make_mesh, param_sharding, replicate
from khmer_ocr_tpu.train.schedule import staged_cyclic_lr
from khmer_ocr_tpu.train.step import init_train_state, make_optimizer, make_train_step

TINY = ModelConfig(vocab_size=30, emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                   enc_ffn_dim=128, max_global_len=256, decode_max_len=16, backbone="vgg")

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _batch(rng, b):
    return {
        "chunks": jnp.asarray(rng.uniform(-1, 1, (b, 2, 48, 100)).astype(np.float32)),
        "chunk_counts": jnp.asarray(np.full((b,), 2, np.int32)),
        "labels": jnp.asarray(np.tile(np.array([[2, 5, 6, 7, 3, 0]], np.int32), (b, 1))),
    }


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_data_parallel_train_step_matches_single_device():
    """The sharded train step must produce the same loss as unsharded."""
    rng = np.random.RandomState(0)
    optimizer = make_optimizer(staged_cyclic_lr(TrainConfig(), 10))
    state = init_train_state(jax.random.PRNGKey(0), TINY, optimizer)
    step = make_train_step(TINY, optimizer, donate=False)
    batch = _batch(rng, 8)

    _, m_single = step(state, batch, jax.random.PRNGKey(7), 1e-4)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = {
        "chunks": jax.device_put(batch["chunks"], batch_sharding(mesh, 4)),
        "chunk_counts": jax.device_put(batch["chunk_counts"], batch_sharding(mesh, 1)),
        "labels": jax.device_put(batch["labels"], batch_sharding(mesh, 2)),
    }
    state_r = jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), state)
    _, m_shard = step(state_r, sharded, jax.random.PRNGKey(7), 1e-4)
    assert float(m_single["loss"]) == pytest.approx(float(m_shard["loss"]), rel=1e-5)


def test_tensor_parallel_forward_matches():
    """TP-sharded params give the same logits as replicated (GSPMD inserts the
    collectives; numerics must match up to reduction order)."""
    from khmer_ocr_tpu.models.layers import Ctx
    from khmer_ocr_tpu.models.ocr_model import forward_train, init_model

    params, stats = init_model(jax.random.PRNGKey(1), TINY)
    rng = np.random.RandomState(1)
    batch = _batch(rng, 4)
    ctx = Ctx(num_heads=TINY.num_heads, dropout=0.0, deterministic=True)

    fn = jax.jit(lambda p, s, c, n, t: forward_train(p, s, c, n, t, TINY, ctx, False)[0])
    ref = np.asarray(fn(params, stats, batch["chunks"], batch["chunk_counts"], batch["labels"][:, :-1]))

    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = jax.tree.map(jax.device_put, params, param_sharding(mesh, params))
    s_sh = jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), stats)
    out = np.asarray(fn(
        p_sh, s_sh,
        jax.device_put(batch["chunks"], batch_sharding(mesh, 4)),
        jax.device_put(batch["chunk_counts"], batch_sharding(mesh, 1)),
        jax.device_put(batch["labels"][:, :-1], batch_sharding(mesh, 2)),
    ))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_data_parallel_decode_matches():
    from khmer_ocr_tpu.infer.predictor import _infer_jit
    from khmer_ocr_tpu.models.ocr_model import init_model

    params, stats = init_model(jax.random.PRNGKey(2), TINY)
    rng = np.random.RandomState(2)
    chunks = jnp.asarray(rng.uniform(-1, 1, (8, 2, 48, 100)).astype(np.float32))
    counts = jnp.asarray(np.full((8,), 2, np.int32))
    dc = DecodeConfig(beam_width=1, max_len=16)
    ref = np.asarray(_infer_jit(params, stats, chunks, counts, TINY, dc, False, "highest"))

    mesh = make_mesh(n_data=8, n_model=1)
    out = np.asarray(_infer_jit(
        jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), params),
        jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), stats),
        jax.device_put(chunks, batch_sharding(mesh, 4)),
        jax.device_put(counts, batch_sharding(mesh, 1)),
        TINY, dc, False, "highest",
    ))
    np.testing.assert_array_equal(out, ref)


def test_data_parallel_beam_decode_matches():
    """Beam-3 (grouped cross-attention + lineage gathers) must be exact under
    batch sharding — the published-CER decode config on the serving mesh."""
    from khmer_ocr_tpu.infer.predictor import _infer_jit
    from khmer_ocr_tpu.models.ocr_model import init_model

    params, stats = init_model(jax.random.PRNGKey(3), TINY)
    rng = np.random.RandomState(3)
    chunks = jnp.asarray(rng.uniform(-1, 1, (8, 2, 48, 100)).astype(np.float32))
    counts = jnp.asarray(np.full((8,), 2, np.int32))
    dc = DecodeConfig(beam_width=3, max_len=16)
    ref = np.asarray(_infer_jit(params, stats, chunks, counts, TINY, dc, True, "highest"))

    mesh = make_mesh(n_data=8, n_model=1)
    out = np.asarray(_infer_jit(
        jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), params),
        jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), stats),
        jax.device_put(chunks, batch_sharding(mesh, 4)),
        jax.device_put(counts, batch_sharding(mesh, 1)),
        TINY, dc, True, "highest",
    ))
    np.testing.assert_array_equal(out, ref)


def test_mesh_predictor_matches_single_device():
    """Predictor(mesh=...) data-parallel serving gives identical strings."""
    from khmer_ocr_tpu.config import OCRConfig, RuntimeConfig
    from khmer_ocr_tpu.infer.predictor import Predictor
    from khmer_ocr_tpu.models.ocr_model import init_model
    from PIL import Image

    params, stats = init_model(jax.random.PRNGKey(5), TINY)
    cfg = OCRConfig().replace(runtime=RuntimeConfig(matmul_precision="default",
                                                    chunk_buckets=(1, 2, 4), batch_buckets=(8,)))
    imgs = [Image.fromarray(np.random.RandomState(s).randint(0, 255, (32, 100 + 40 * s), np.uint8))
            for s in range(6)]
    single = Predictor(params=params, batch_stats=stats, model_cfg=TINY, config=cfg)
    ref = single.predict_batch(imgs, beam_width=1, batch_size=8)
    meshed = Predictor(params=params, batch_stats=stats, model_cfg=TINY, config=cfg,
                       mesh=make_mesh(n_data=8, n_model=1))
    out = meshed.predict_batch(imgs, beam_width=1, batch_size=8)
    assert out == ref
