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
