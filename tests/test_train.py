"""Training tests: staged LR schedule, masked loss, overfit sanity
(the reference's de-facto unit tests, CNN-Transformer.ipynb [cells 15-16]),
augmenter invariants, bucketed data pipeline, checkpoint round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import ModelConfig, TrainConfig
from khmer_ocr_tpu.models.layers import Ctx
from khmer_ocr_tpu.models.ocr_model import forward_train, init_model
from khmer_ocr_tpu.train.schedule import staged_cyclic_lr
from khmer_ocr_tpu.train.step import init_train_state, loss_fn, make_optimizer, make_train_step

TINY = ModelConfig(vocab_size=30, emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                   enc_ffn_dim=128, max_global_len=256, decode_max_len=32, backbone="se_vgg")


def test_staged_cyclic_lr():
    cfg = TrainConfig()
    spe = 100
    sched = staged_cyclic_lr(cfg, spe)
    # epochs 1-15 fixed 1e-4
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(14 * spe + 50)) == pytest.approx(1e-4)
    # epoch 16: triangular 1e-5 -> 1e-4: base at it=0, peak at it=50
    e16 = 15 * spe
    assert float(sched(e16)) == pytest.approx(1e-5)
    assert float(sched(e16 + 50)) == pytest.approx(1e-4)
    assert float(sched(e16 + 25)) == pytest.approx((1e-5 + 1e-4) / 2)
    # epoch 31+: 1e-6 -> 1e-5
    e31 = 30 * spe
    assert float(sched(e31)) == pytest.approx(1e-6)
    assert float(sched(e31 + 50)) == pytest.approx(1e-5)
    # cycle resets each epoch (scheduler recreated per epoch in the reference)
    assert float(sched(e16 + spe)) == pytest.approx(1e-5)


def _tiny_batch(rng, b=4, n=2, label_len=10, vocab=30):
    chunks = rng.uniform(-1, 1, (b, n, 48, 100)).astype(np.float32)
    counts = np.full((b,), n, np.int32)
    labels = np.zeros((b, label_len), np.int32)
    for i in range(b):
        L = rng.randint(4, label_len)
        labels[i, 0] = 2
        labels[i, 1 : L - 1] = rng.randint(4, vocab, L - 2)
        labels[i, L - 1] = 3
    return {"chunks": jnp.asarray(chunks), "chunk_counts": jnp.asarray(counts), "labels": jnp.asarray(labels)}


def test_loss_masks_padding():
    rng = np.random.RandomState(0)
    params, stats = init_model(jax.random.PRNGKey(0), TINY)
    batch = _tiny_batch(rng)
    loss1, _ = jax.jit(lambda p, s, b: loss_fn(p, s, b, TINY, jax.random.PRNGKey(0), False))(params, stats, batch)
    # adding extra pad columns must not change the loss
    batch2 = dict(batch)
    batch2["labels"] = jnp.concatenate([batch["labels"], jnp.zeros((4, 6), jnp.int32)], axis=1)
    loss2, _ = jax.jit(lambda p, s, b: loss_fn(p, s, b, TINY, jax.random.PRNGKey(0), False))(params, stats, batch2)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    assert 2.0 < float(loss1) < 6.0  # ~ln(30)=3.4 at init


def test_overfit_sanity():
    """Reference sanity_check_overfit ([cell 16]): 50 iters on 4 samples must
    reach < 10% of the initial loss."""
    rng = np.random.RandomState(1)
    optimizer = make_optimizer(lambda step: 1e-3)
    state = init_train_state(jax.random.PRNGKey(1), TINY, optimizer)
    step = make_train_step(TINY, optimizer, donate=False)
    batch = _tiny_batch(rng)
    losses = []
    for i in range(50):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i), 1e-3)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.1 * losses[0], f"no overfit: {losses[0]:.3f} -> {losses[-1]:.3f}"
    assert np.isfinite(losses).all()


def test_one_compile_across_lr_and_dataset_sizes():
    """The lr is a traced scalar: different schedules / steps_per_epoch values
    must reuse ONE compiled train step (round-1 VERDICT weak #4)."""
    rng = np.random.RandomState(3)
    optimizer = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), TINY, optimizer)
    step = make_train_step(TINY, optimizer, donate=False)
    batch = _tiny_batch(rng)
    cfg = TrainConfig()
    for spe in (10, 37, 100):  # three dataset sizes -> three schedules
        sched = staged_cyclic_lr(cfg, spe)
        state, _ = step(state, batch, jax.random.PRNGKey(0), sched(int(state.step)))
    assert step._cache_size() == 1, f"expected 1 compile, got {step._cache_size()}"


def test_train_updates_batch_stats():
    rng = np.random.RandomState(2)
    optimizer = make_optimizer(lambda s: 1e-4)
    state = init_train_state(jax.random.PRNGKey(0), TINY, optimizer)
    step = make_train_step(TINY, optimizer, donate=False)
    before = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    state2, _ = step(state, _tiny_batch(rng), jax.random.PRNGKey(0), 1e-4)
    after = np.asarray(jax.tree.leaves(state2.batch_stats)[0])
    assert not np.allclose(before, after), "BN running stats must update in training"
    assert int(state2.step) == 1


def test_augmenter_shapes_and_range():
    from khmer_ocr_tpu.train.augment import Augmenter

    aug = Augmenter(augment_prob=1.0)
    rng = np.random.default_rng(0)
    img = rng.random((48, 300)).astype(np.float32)
    for i in range(20):
        out = aug(img, np.random.default_rng(i))
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0001


def test_data_pipeline_buckets():
    from khmer_ocr_tpu.train.data import LineDataset

    rng = np.random.default_rng(0)
    samples = []
    for w, text in [(80, "១២"), (300, "១២៣៤៥"), (900, "១២៣៤៥៦៧៨៩")]:
        samples.append((np.full((30, w), 255, np.uint8), text))
    ds = LineDataset(samples * 3, augment=False)
    batches = list(ds.epoch_batches(batch_size=4, rng=rng))
    total = 0
    for b in batches:
        assert b.chunks.shape[0] == 4  # static batch (padded with repeats)
        assert b.chunks.shape[2:] == (48, 100)
        assert b.labels.shape[0] == 4
        assert (b.labels[:, 0] == 2).all()  # <sos>
        total += len(b.texts)
    assert total >= 9


def test_checkpoint_roundtrip(tmp_path):
    from khmer_ocr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params, stats = init_model(jax.random.PRNGKey(3), TINY)
    save_checkpoint(tmp_path / "ck", params, stats, TINY, step=7)
    p2, s2, cfg2 = load_checkpoint(tmp_path / "ck")
    assert cfg2 == TINY
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_matches_single_steps():
    """K-batch grouped dispatch (make_train_multi_step) must be semantically
    IDENTICAL to K sequential single-step dispatches: same fold_in(rng, step)
    stream, same per-step lr, same update/batch order, same state threading.

    Two phases, because bitwise the scan body and the standalone program
    compile to different XLA fusions (~1 ulp/step of rounding skew), and
    Adam's step-1 update is g/(|g|+eps) — a SIGN function near g=0, so any
    param-level tolerance is ill-conditioned under Adam (a 1-ulp gradient
    difference can flip a whole +/-lr):
      1. identity optimizer (pure -lr*g SGD): well-conditioned, so params
         must match tightly after K steps — this pins the plumbing exactly.
      2. Adam (the real optimizer): the loss trajectory must match at 1e-5 —
         losses at steps 2..K are computed THROUGH the step-1/2 params, so a
         wrong rng stream, lr order, or state threading shows up here."""
    import optax

    from khmer_ocr_tpu.train.step import make_train_multi_step

    rng = np.random.RandomState(7)
    base = jax.random.PRNGKey(42)
    K = 3
    batches = [_tiny_batch(rng) for _ in range(K)]
    lrs = np.asarray([1e-3, 5e-4, 2e-4], np.float32)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    def run_pair(optimizer):
        single = make_train_step(TINY, optimizer, donate=False)
        s1 = init_train_state(jax.random.PRNGKey(5), TINY, optimizer)
        losses1 = []
        for b, lr in zip(batches, lrs):
            s1, m = single(s1, b, base, lr)
            losses1.append(float(m["loss"]))
        multi = make_train_multi_step(TINY, optimizer, donate=False)
        s2 = init_train_state(jax.random.PRNGKey(5), TINY, optimizer)
        s2, m2 = multi(s2, stacked, base, jnp.asarray(lrs))
        assert int(s1.step) == int(s2.step) == K
        return s1, s2, losses1, m2

    # phase 1: exact plumbing under a well-conditioned update rule
    s1, s2, losses1, m2 = run_pair(optax.identity())
    np.testing.assert_allclose(np.asarray(m2["loss"]), losses1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    # phase 2: the real Adam optimizer — loss trajectory compounds through the
    # updated params, so it catches any semantic divergence
    _, _, losses1, m2 = run_pair(make_optimizer())
    np.testing.assert_allclose(np.asarray(m2["loss"]), losses1, rtol=1e-5)


def test_train_loop_grouped_dispatch(tmp_path):
    """The full train() loop with dispatch_group>1 runs, counts every batch
    exactly once, and (single-shape workload, so dispatch order is identical)
    matches a dispatch_group=1 run's loss trajectory."""
    import dataclasses

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.train.data import LineDataset
    from khmer_ocr_tpu.train.loop import train

    rng = np.random.RandomState(3)
    # one width -> one (chunk, label) shape key -> grouped dispatch preserves
    # the single-dispatch batch order exactly
    samples = [(rng.randint(0, 255, (48, 60), np.uint8), "កខគ") for _ in range(24)]
    cfg = OCRConfig()
    cfg = cfg.replace(
        model=TINY,
        train=dataclasses.replace(cfg.train, batch_size=4, epoch_sample_size=24,
                                  num_epochs=1, checkpoint_every_epochs=100),
    )

    def run(group, mdir):
        ds = LineDataset(samples, train_cfg=cfg.train, device_augment=True)
        mpath = tmp_path / f"metrics_{group}.jsonl"
        state = train(ds, cfg, checkpoint_dir=tmp_path / mdir, dispatch_group=group,
                      metrics_path=mpath, log_every=2, eye_test_every=4)
        import json
        rec = json.loads(mpath.read_text().strip().splitlines()[-1])
        return state, rec

    s_grp, rec_grp = run(2, "ck_a")
    s_one, rec_one = run(1, "ck_b")
    assert rec_grp["batches"] == rec_one["batches"] == 6
    assert int(s_grp.step) == int(s_one.step) == 6
    assert rec_grp["mean_loss"] == pytest.approx(rec_one["mean_loss"], rel=1e-4)
