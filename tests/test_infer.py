"""Predictor/API-level tests on a tiny model (CPU)."""

import numpy as np
import pytest
from PIL import Image

import jax

from khmer_ocr_tpu.config import ModelConfig, OCRConfig, RuntimeConfig, backbone_for_path
from khmer_ocr_tpu.infer.predictor import Predictor
from khmer_ocr_tpu.models.ocr_model import init_model

TINY = ModelConfig(vocab_size=124, emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                   enc_ffn_dim=128, max_global_len=512, decode_max_len=12, backbone="vgg",
                   use_bilstm=False)


@pytest.fixture(scope="module")
def predictor():
    params, stats = init_model(jax.random.PRNGKey(0), TINY)
    cfg = OCRConfig().replace(runtime=RuntimeConfig(matmul_precision="default",
                                                    chunk_buckets=(1, 2, 4), batch_buckets=(1, 4)))
    return Predictor(params=params, batch_stats=stats, model_cfg=TINY, config=cfg)


def _img(w, seed=0):
    return Image.fromarray(np.random.RandomState(seed).randint(0, 255, (32, w), np.uint8))


def test_predict_batch_order_and_padding(predictor):
    # widths spanning buckets 1/2/4, batch padded to bucket sizes; results must
    # come back in input order regardless of bucket grouping
    imgs = [_img(60, 1), _img(400, 2), _img(150, 3), _img(60, 1)]
    out = predictor.predict_batch(imgs, beam_width=1, batch_size=4)
    assert len(out) == 4
    assert all(isinstance(t, str) for t in out)
    assert out[0] == out[3]  # identical inputs -> identical outputs
    single = predictor.predict(imgs[1], beam_width=1)
    assert single == out[1]  # bucketed batch == single-image result


def test_beam_and_greedy_both_run(predictor):
    img = _img(120, 5)
    g = predictor.predict(img, beam_width=1)
    b = predictor.predict(img, beam_width=3)
    assert isinstance(g, str) and isinstance(b, str)


def test_backbone_for_path():
    assert backbone_for_path("weights/khmerocr_vgg_epoch100.pth") == "vgg"
    assert backbone_for_path("KHMEROCR_RESNET.pth") == "resnet"
    assert backbone_for_path("khmerocr_se_transformer.pth") == "se_vgg"


def test_empty_batch(predictor):
    assert predictor.predict_batch([]) == []


def test_grouped_dispatch_canonical_and_bounded():
    """Grouped dispatch must (a) canonicalize member order so bucket arrival
    order does not mint new shape combinations, (b) stop compiling new
    combinations past runtime.max_group_combos and fall back to per-batch
    dispatch, and (c) stay result-correct throughout (ADVICE r2 medium)."""
    params, stats = init_model(jax.random.PRNGKey(0), TINY)
    cfg = OCRConfig().replace(
        runtime=RuntimeConfig(matmul_precision="default", chunk_buckets=(1, 2, 4),
                              batch_buckets=(1, 2), max_inflight_batches=2,
                              max_group_combos=1)
    )
    p = Predictor(params=params, batch_stats=stats, model_cfg=TINY, config=cfg)

    # widths hitting buckets 1 / 2 / 4; batch_size=1 so every image is its own
    # bucket batch and groups form in arrival order
    w1, w2, w4 = 60, 150, 400
    # FIRST sighting of a combo must NOT compile a combined program (per-batch
    # fallback): combined compiles are only worth paying for repeating combos
    a = p.predict_batch([_img(w1, 1), _img(w2, 2)], beam_width=1, batch_size=1)
    assert len(p._group_combos) == 0 and len(p._group_combo_seen) == 1
    # same shapes, opposite arrival order -> canonical sort maps to the SAME
    # key; second sighting compiles it
    b = p.predict_batch([_img(w2, 2), _img(w1, 1)], beam_width=1, batch_size=1)
    assert len(p._group_combos) == 1 and len(p._group_combo_seen) == 1
    only_key = next(iter(p._group_combos))
    assert a[0] == b[1] and a[1] == b[0]
    # a NEW combination with the budget exhausted must not mint a key (falls
    # back to per-batch dispatch) and must still return correct results
    for _ in range(2):  # twice: past the sighting threshold, into the budget gate
        c = p.predict_batch([_img(w4, 3), _img(w1, 1)], beam_width=1, batch_size=1)
    assert p._group_combos == {only_key}
    assert c[1] == a[0]


def test_group_compile_failure_blacklisted(monkeypatch):
    """A packed-group compile failure must fall back to per-batch dispatch AND
    be blacklisted: the expensive failing compile is attempted ONCE, not per
    predict_batch call (observed live: a scoped-VMEM OOM retried every pass
    cut serving to 6 lines/s)."""
    params, stats = init_model(jax.random.PRNGKey(0), TINY)
    cfg = OCRConfig().replace(
        runtime=RuntimeConfig(matmul_precision="default", chunk_buckets=(1, 2),
                              batch_buckets=(1, 2), max_inflight_batches=2)
    )
    p = Predictor(params=params, batch_stats=stats, model_cfg=TINY, config=cfg)
    calls = {"packed": 0}

    def boom(self, batches, bw, ml):
        calls["packed"] += 1
        raise jax.errors.JaxRuntimeError("synthetic compile OOM")

    monkeypatch.setattr(Predictor, "_dispatch_group_packed", boom)
    imgs = [_img(60, 1), _img(150, 2)]
    a = p.predict_batch(imgs, beam_width=1, batch_size=1)  # 1st sighting: per-batch, no attempt
    assert calls["packed"] == 0 and len(p._group_combos_failed) == 0
    a2 = p.predict_batch(imgs, beam_width=1, batch_size=1)  # 2nd sighting: attempt -> fail
    assert calls["packed"] == 1 and len(p._group_combos_failed) == 1
    b = p.predict_batch(imgs, beam_width=1, batch_size=1)
    assert calls["packed"] == 1  # blacklisted: no second attempt
    assert a == a2 == b and all(isinstance(t, str) for t in a)
