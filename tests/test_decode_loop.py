"""Whole-decode beam megakernel (ops/pallas/decode_loop.py) token parity vs the
XLA beam loop (decode/beam.py), interpreter mode on CPU.

The megakernel re-implements the ENTIRE beam bookkeeping in-kernel (per-beam
top-K, eos retirement with length normalization, lowest-flat-index tie-breaks,
pointer lineage) — these tests require token-for-token equality with the
reference-parity-tested XLA loop across batched, padded-memory, eos-emitting,
and tie-heavy configurations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
from khmer_ocr_tpu.decode.beam import beam_decode
from khmer_ocr_tpu.models.ocr_model import init_model
from khmer_ocr_tpu.ops.pallas.decode_loop import fused_beam_decode

TINY = ModelConfig(emb_dim=64, num_heads=4, enc_layers=1, dec_layers=2,
                   enc_ffn_dim=128, max_global_len=256,
                   decode_max_len=64, backbone="vgg", use_bilstm=False,
                   vocab_size=124)


def _setup(b=4, tm=32, seed=0):
    params, _ = init_model(jax.random.PRNGKey(seed), TINY)
    rng = np.random.RandomState(seed)
    memory = jnp.asarray(rng.randn(b, tm, TINY.emb_dim).astype(np.float32) * 0.5)
    lens = rng.randint(max(tm // 2, 1), tm + 1, size=b)
    pad = jnp.asarray(np.arange(tm)[None, :] >= lens[:, None])
    return params, memory, pad


def _both(params, memory, pad, dec_cfg):
    xla = beam_decode(params, memory, pad, TINY,
                      dataclasses.replace(dec_cfg, mega_mode="0"))
    mega = fused_beam_decode(params, memory, pad, TINY, dec_cfg, interpret=True)
    return np.asarray(xla), np.asarray(mega)


@pytest.mark.parametrize("beam_width", [2, 3])
def test_mega_token_parity(beam_width):
    params, memory, pad = _setup(b=4, tm=32)
    dec = DecodeConfig(beam_width=beam_width, max_len=12)
    xla, mega = _both(params, memory, pad, dec)
    np.testing.assert_array_equal(mega, xla)


def test_mega_long_decode_padded_memory():
    params, memory, pad = _setup(b=2, tm=64, seed=3)
    dec = DecodeConfig(beam_width=3, max_len=48)
    xla, mega = _both(params, memory, pad, dec)
    np.testing.assert_array_equal(mega, xla)


def test_mega_eos_heavy():
    """Bias the out-projection toward <eos> so completions retire early and the
    best-done tracking dominates the answer."""
    params, memory, pad = _setup(b=4, tm=16, seed=5)
    out_b = params["dec"]["out"]["b"]
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["dec"]["out"]["b"] = out_b.at[3].add(4.0)  # eos_idx=3
    dec = DecodeConfig(beam_width=3, max_len=16)
    xla, mega = _both(params, memory, pad, dec)
    np.testing.assert_array_equal(mega, xla)


def test_mega_exact_ties():
    """Exact score ties (duplicated vocab rows) must resolve identically —
    lax.top_k's lowest-index tie-break vs the kernel's iterative min-index."""
    params, memory, pad = _setup(b=2, tm=16, seed=7)
    w = params["dec"]["out"]["w"]
    b_ = params["dec"]["out"]["b"]
    # duplicate logits for tokens 10/11 and 20/21: candidate ties every step
    w = w.at[:, 11].set(w[:, 10])
    b_ = b_.at[11].set(b_[10])
    w = w.at[:, 21].set(w[:, 20])
    b_ = b_.at[21].set(b_[20])
    params["dec"]["out"]["w"] = w
    params["dec"]["out"]["b"] = b_
    dec = DecodeConfig(beam_width=3, max_len=10)
    xla, mega = _both(params, memory, pad, dec)
    np.testing.assert_array_equal(mega, xla)


def test_mega_through_beam_decode_gate():
    """beam_decode with mega_mode='1' routes through the megakernel and matches
    mega_mode='0' token-for-token."""
    params, memory, pad = _setup(b=2, tm=16, seed=9)
    base = DecodeConfig(beam_width=2, max_len=8)
    xla = np.asarray(beam_decode(params, memory, pad, TINY,
                                 dataclasses.replace(base, mega_mode="0")))
    via_gate = np.asarray(beam_decode(params, memory, pad, TINY,
                                      dataclasses.replace(base, mega_mode="1")))
    np.testing.assert_array_equal(via_gate, xla)
