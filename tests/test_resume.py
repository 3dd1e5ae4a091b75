"""Checkpoint resume: params/opt-state/step restore and epoch continuation."""

import logging

import numpy as np

import jax

from khmer_ocr_tpu.config import ModelConfig, OCRConfig, TrainConfig
from khmer_ocr_tpu.train.data import LineDataset
from khmer_ocr_tpu.train.loop import train

TINY = ModelConfig(vocab_size=124, emb_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                   enc_ffn_dim=128, max_global_len=256, decode_max_len=16, backbone="vgg",
                   use_bilstm=False)


def _dataset(n=8):
    rng = np.random.RandomState(0)
    samples = [(np.full((30, 120), 255, np.uint8), "១២៣") for _ in range(n)]
    return LineDataset(samples, augment=False)


def test_train_resume_continues(tmp_path, caplog):
    import dataclasses

    cfg = OCRConfig().replace(
        model=TINY,
        train=dataclasses.replace(TrainConfig(), batch_size=4, epoch_sample_size=8,
                                  checkpoint_every_epochs=1, seed=0),
    )
    ds = _dataset()
    state1 = train(ds, cfg, checkpoint_dir=tmp_path, num_epochs=1)
    assert int(state1.step) == 2  # 8 samples / batch 4

    with caplog.at_level(logging.INFO):
        state2 = train(ds, cfg, checkpoint_dir=tmp_path, num_epochs=2,
                       resume_from=tmp_path / "epoch001")
    assert any("resumed from" in r.message for r in caplog.records)
    assert int(state2.step) == 4  # continued epoch 2 only
    # resumed params differ from a fresh init (training actually continued)
    p1 = jax.tree.leaves(state1.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
