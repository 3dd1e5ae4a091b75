"""Unit tests for decode helpers."""

from khmer_ocr_tpu.models.ocr_model import decode_windows


def test_decode_windows_schedule():
    assert decode_windows(256) == (32, 64, 128, 256)
    assert decode_windows(64) == (32, 64)
    assert decode_windows(32) == (32,)
    assert decode_windows(24) == (24,)  # max_len below the base window
    assert decode_windows(100) == (32, 64, 100)


def test_decode_train_length_guard():
    import numpy as np
    import pytest
    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import ModelConfig
    from khmer_ocr_tpu.models.layers import Ctx
    from khmer_ocr_tpu.models.ocr_model import decode_train, init_model

    cfg = ModelConfig(vocab_size=20, emb_dim=32, num_heads=4, enc_layers=1, dec_layers=1,
                      enc_ffn_dim=64, max_global_len=64, decode_max_len=8, backbone="vgg",
                      use_bilstm=False)
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    memory = jnp.zeros((1, 16, 32))
    pad = jnp.zeros((1, 16), bool)
    ctx = Ctx(num_heads=4, dropout=0.0, deterministic=True)
    with pytest.raises(ValueError, match="positional embedding"):
        decode_train(params, memory, pad, jnp.zeros((1, 9), jnp.int32), cfg, ctx)
