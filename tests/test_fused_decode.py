"""Fused Pallas decode-step parity (interpreter mode on CPU).

Three gates for ops/pallas/decode_step.py:
  1. single layer-step outputs == the XLA decoder_layer_step bit-for-bit in
     f32 (greedy and beam-lineage variants, several positions);
  2. full greedy decode with the fused kernel == the XLA path token-for-token
     across cache-window boundaries;
  3. full beam-3 decode likewise (pointer lineage + grouped cross-attention).

``KHMER_OCR_FUSED_DECODE=1`` forces the fused path through the Pallas
interpreter off-TPU (ops/pallas/decode_step.py::should_use_fused).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
from khmer_ocr_tpu.decode import beam_decode, greedy_decode
from khmer_ocr_tpu.models.layers import Ctx, decoder_layer_init, decoder_layer_step, pack_step_params
from khmer_ocr_tpu.models.ocr_model import init_model
from khmer_ocr_tpu.ops.pallas.decode_step import (
    fused_decoder_layer_step,
    fused_step_available,
    layer_weights,
)

D, H, F = 64, 4, 256


@pytest.mark.parametrize("lanes,pos", [(1, 0), (1, 5), (1, 15), (3, 0), (3, 7), (3, 15)])
def test_layer_step_parity(lanes, pos):
    b_img, w, tm, cache_len = 4, 16, 24, 32
    lp = pack_step_params(decoder_layer_init(jax.random.PRNGKey(0), D, F))
    ctx = Ctx(num_heads=H, dropout=0.0, deterministic=True)
    r = np.random.RandomState(pos * 10 + lanes)
    b = b_img * lanes
    x = jnp.asarray(r.randn(b, D).astype(np.float32) * 0.3)
    self_k = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    self_v = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    mem_k = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    mem_v = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    valid = jnp.asarray(r.rand(b_img, tm) > 0.2).at[:, 0].set(True)

    if lanes > 1:
        lin_local = jnp.asarray(r.randint(0, lanes, size=(b, w)).astype(np.int32))
        lin_abs = lin_local + lanes * (jnp.arange(b, dtype=jnp.int32)[:, None] // lanes)
        own = jnp.arange(b, dtype=jnp.int32)[:, None]
        idx = jnp.where(jnp.arange(w)[None, :] == pos, own, lin_abs)
    else:
        lin_local = idx = None

    x_ref, k_ref, v_ref = decoder_layer_step(
        lp, ctx, x, pos, self_k, self_v, mem_k, mem_v, valid, window=w, lineage_idx=idx
    )
    assert fused_step_available(b, lanes, w, tm, D, F, H, 4, strict_tiling=False)
    x_f, k_f, v_f = fused_decoder_layer_step(
        layer_weights(lp), x, pos, self_k, self_v, mem_k, mem_v,
        valid.astype(jnp.float32), lin_local,
        num_heads=H, window=w, lanes=lanes, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_ref))


@pytest.mark.parametrize("lanes", [1, 3])
def test_streaming_cross_parity(lanes):
    """Tm > 128 engages the streaming (online-softmax) cross-attention path;
    outputs match the resident XLA layer step to fp tolerance."""
    b_img, w, tm, cache_len, pos = 2, 16, 256, 32, 9
    lp = pack_step_params(decoder_layer_init(jax.random.PRNGKey(2), D, F))
    ctx = Ctx(num_heads=H, dropout=0.0, deterministic=True)
    r = np.random.RandomState(7)
    b = b_img * lanes
    x = jnp.asarray(r.randn(b, D).astype(np.float32) * 0.3)
    self_k = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    self_v = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    mem_k = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    mem_v = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    valid = jnp.asarray(r.rand(b_img, tm) > 0.3).at[:, 0].set(True)
    if lanes > 1:
        lin_local = jnp.asarray(r.randint(0, lanes, size=(b, w)).astype(np.int32))
        lin_abs = lin_local + lanes * (jnp.arange(b, dtype=jnp.int32)[:, None] // lanes)
        own = jnp.arange(b, dtype=jnp.int32)[:, None]
        idx = jnp.where(jnp.arange(w)[None, :] == pos, own, lin_abs)
    else:
        lin_local = idx = None
    x_ref, k_ref, v_ref = decoder_layer_step(
        lp, ctx, x, pos, self_k, self_v, mem_k, mem_v, valid, window=w, lineage_idx=idx
    )
    x_f, k_f, v_f = fused_decoder_layer_step(
        layer_weights(lp), x, pos, self_k, self_v, mem_k, mem_v,
        valid.astype(jnp.float32), lin_local,
        num_heads=H, window=w, lanes=lanes, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), atol=5e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_ref))


@pytest.mark.parametrize("lanes,pos,tiles", [(1, 5, 1), (3, 7, 1), (3, 7, 2)])
def test_mem_prefetch_parity(lanes, pos, tiles, monkeypatch):
    """KHMER_OCR_MEM_PREFETCH=1: the resident path's memory K/V move to manual
    double-buffered DMA (issued at body entry, awaited at the cross stage) —
    outputs must stay bit-identical to the auto-pipelined resident path.
    ``tiles=2`` clamps the VMEM budget so the grid runs two image tiles,
    covering the kernel's program_id-offset HBM slicing."""
    from khmer_ocr_tpu.ops.pallas import decode_step as ds

    b_img, w, tm, cache_len = 4, 16, 24, 32
    if tiles > 1:
        budget = ds._vmem_estimate(b_img // tiles, lanes, w, tm, D, F, H, 4)
        assert ds._vmem_estimate(b_img, lanes, w, tm, D, F, H, 4) > budget
        monkeypatch.setattr(ds, "VMEM_BUDGET", budget)
    lp = pack_step_params(decoder_layer_init(jax.random.PRNGKey(0), D, F))
    ctx = Ctx(num_heads=H, dropout=0.0, deterministic=True)
    r = np.random.RandomState(pos * 10 + lanes)
    b = b_img * lanes
    x = jnp.asarray(r.randn(b, D).astype(np.float32) * 0.3)
    self_k = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    self_v = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    mem_k = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    mem_v = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    valid = jnp.asarray(r.rand(b_img, tm) > 0.2).at[:, 0].set(True)
    if lanes > 1:
        lin_local = jnp.asarray(r.randint(0, lanes, size=(b, w)).astype(np.int32))
        lin_abs = lin_local + lanes * (jnp.arange(b, dtype=jnp.int32)[:, None] // lanes)
        own = jnp.arange(b, dtype=jnp.int32)[:, None]
        idx = jnp.where(jnp.arange(w)[None, :] == pos, own, lin_abs)
    else:
        lin_local = idx = None
    x_ref, k_ref, v_ref = decoder_layer_step(
        lp, ctx, x, pos, self_k, self_v, mem_k, mem_v, valid, window=w, lineage_idx=idx
    )
    monkeypatch.setattr(ds, "_MEM_PREFETCH", True)
    x_f, k_f, v_f = fused_decoder_layer_step(
        layer_weights(lp), x, pos, self_k, self_v, mem_k, mem_v,
        valid.astype(jnp.float32), lin_local,
        num_heads=H, window=w, lanes=lanes, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_ref))


TINY = ModelConfig(vocab_size=40, emb_dim=D, num_heads=H, enc_layers=1, dec_layers=2,
                   enc_ffn_dim=128, max_global_len=256, decode_max_len=80, backbone="vgg",
                   use_bilstm=False)
EOS, SOS, PAD = 3, 2, 0


@pytest.fixture(scope="module")
def setup():
    params, _ = init_model(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(1)
    memory = jnp.asarray(rng.randn(2, 48, D).astype(np.float32) * 0.5)
    pad = jnp.zeros((2, 48), bool).at[0, 40:].set(True)
    return params, memory, pad


def _tokens(fn, params, memory, pad):
    return np.asarray(jax.jit(fn)(params, memory, pad))


def test_greedy_fused_matches_xla(setup, monkeypatch):
    params, memory, pad = setup
    dc = DecodeConfig(beam_width=1, max_len=80, sos_idx=SOS, eos_idx=EOS, pad_idx=PAD)
    fn = lambda p, m, pm: greedy_decode(p, m, pm, TINY, dc)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "0")
    ref = _tokens(fn, params, memory, pad)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "1")
    got = _tokens(lambda p, m, pm: greedy_decode(p, m, pm, TINY, dc), params, memory, pad)
    np.testing.assert_array_equal(got, ref)
    # decode must have crossed the 32-slot window boundary to exercise staging
    assert (ref != PAD).sum(axis=1).max() > 33


def test_beam_fused_matches_xla(setup, monkeypatch):
    params, memory, pad = setup
    dc = DecodeConfig(beam_width=3, max_len=80, sos_idx=SOS, eos_idx=EOS, pad_idx=PAD)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "0")
    ref = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc), params, memory, pad)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "1")
    got = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc), params, memory, pad)
    np.testing.assert_array_equal(got, ref)


def test_beam_fused_prefetch_matches_xla(setup, monkeypatch):
    """Full beam-3 decode with KHMER_OCR_MEM_PREFETCH=1 (manual memory-K/V
    DMA inside the kernel): tokens identical to the XLA path end-to-end."""
    from khmer_ocr_tpu.ops.pallas import decode_step as ds

    params, memory, pad = setup
    dc = DecodeConfig(beam_width=3, max_len=80, sos_idx=SOS, eos_idx=EOS, pad_idx=PAD)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "0")
    ref = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc), params, memory, pad)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "1")
    monkeypatch.setattr(ds, "_MEM_PREFETCH", True)
    got = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc), params, memory, pad)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("lanes", [1, 3])
def test_head_fusion_parity(lanes):
    """The fused decode head (in-kernel out-proj + masked log-softmax over a
    128-padded vocab) matches dense + jax.nn.log_softmax on the real columns;
    padded columns come back low enough that no top-k can ever select them."""
    b_img, w, tm, cache_len, pos, v = 4, 16, 24, 32, 7, 40
    lp = pack_step_params(decoder_layer_init(jax.random.PRNGKey(3), D, F))
    ctx = Ctx(num_heads=H, dropout=0.0, deterministic=True)
    r = np.random.RandomState(11)
    b = b_img * lanes
    x = jnp.asarray(r.randn(b, D).astype(np.float32) * 0.3)
    self_k = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    self_v = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3)
    mem_k = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    mem_v = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3)
    valid = jnp.asarray(r.rand(b_img, tm) > 0.2).at[:, 0].set(True)
    lin = (jnp.asarray(r.randint(0, lanes, size=(b, w)).astype(np.int32))
           if lanes > 1 else None)
    ow = jnp.asarray(r.randn(D, v).astype(np.float32) * 0.1)
    ob = jnp.asarray(r.randn(v).astype(np.float32) * 0.1)
    vp = 128
    hw = jnp.zeros((D, vp), jnp.float32).at[:, :v].set(ow)
    hb = jnp.zeros((1, vp), jnp.float32).at[0, :v].set(ob)

    x_f, _, _, logp = fused_decoder_layer_step(
        layer_weights(lp), x, pos, self_k, self_v, mem_k, mem_v,
        valid.astype(jnp.float32), lin,
        num_heads=H, window=w, lanes=lanes, interpret=True, head=(hw, hb, v),
    )
    ref = jax.nn.log_softmax((x_f @ ow + ob).astype(jnp.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(logp)[:, :v], np.asarray(ref), atol=2e-5, rtol=1e-5)
    assert np.asarray(logp)[:, v:].max() < -1e20


@pytest.mark.parametrize("lanes", [1, 3])
def test_head_fusion_parity_bf16(lanes):
    """bf16 serving: the fused head mirrors the XLA head's rounding (bf16
    dense output -> f32 log_softmax), so near-tie tokens cannot diverge
    between the two paths (ADVICE r3 #2)."""
    b_img, w, tm, cache_len, pos, v = 4, 16, 24, 32, 7, 40
    bdt = jnp.bfloat16
    lp = jax.tree.map(lambda a: a.astype(bdt),
                      pack_step_params(decoder_layer_init(jax.random.PRNGKey(3), D, F)))
    r = np.random.RandomState(13)
    b = b_img * lanes
    x = jnp.asarray(r.randn(b, D).astype(np.float32) * 0.3).astype(bdt)
    self_k = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3).astype(bdt)
    self_v = jnp.asarray(r.randn(b, cache_len, D).astype(np.float32) * 0.3).astype(bdt)
    mem_k = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3).astype(bdt)
    mem_v = jnp.asarray(r.randn(b_img, tm, D).astype(np.float32) * 0.3).astype(bdt)
    valid = jnp.asarray(r.rand(b_img, tm) > 0.2).at[:, 0].set(True)
    lin = (jnp.asarray(r.randint(0, lanes, size=(b, w)).astype(np.int32))
           if lanes > 1 else None)
    ow = jnp.asarray(r.randn(D, v).astype(np.float32) * 0.1).astype(bdt)
    ob = jnp.asarray(r.randn(v).astype(np.float32) * 0.1).astype(bdt)
    vp = 128
    hw = jnp.zeros((D, vp), bdt).at[:, :v].set(ow)
    hb = jnp.zeros((1, vp), jnp.float32).at[0, :v].set(ob.astype(jnp.float32))

    x_f, _, _, logp = fused_decoder_layer_step(
        layer_weights(lp), x, pos, self_k, self_v, mem_k, mem_v,
        valid.astype(jnp.float32), lin,
        num_heads=H, window=w, lanes=lanes, interpret=True, head=(hw, hb, v),
    )
    # the XLA head: bf16 dense (f32 accumulation rounded once, bias in bf16)
    # widened to f32 before log_softmax (decode/beam.py). Tolerance is one
    # bf16 ULP at the logit scale: XLA may fold the convert-to-bf16 into the
    # dot (keeping extra lhs precision), so sub-ULP residuals remain even
    # with the kernel mirroring the rounding — what the mirror removes is the
    # SYSTEMATIC f32-vs-bf16 accumulation divergence (ADVICE r3 #2); exact
    # bit parity in bf16 is not claimed (token-level parity tests run f32).
    ref_logits = (jnp.dot(x_f, ow, preferred_element_type=jnp.float32)
                  .astype(bdt) + ob).astype(jnp.float32)
    ref = jax.nn.log_softmax(ref_logits, axis=-1)
    np.testing.assert_allclose(np.asarray(logp)[:, :v], np.asarray(ref), atol=0.02, rtol=0.01)
    assert np.asarray(logp)[:, v:].max() < -1e20


def test_head_gate_rejects_vmem_tight_shapes(monkeypatch):
    """head_fusion_compatible: when the head-augmented VMEM estimate changes
    (or removes) the tile choice, the gate must say no — beam_decode then
    keeps the XLA head instead of tripping the kernel's choose_tile assert."""
    from khmer_ocr_tpu.ops.pallas import decode_step as ds

    args = dict(b_rows=48, k=3, w=64, tm=128, d=384, f=1536, num_heads=8,
                itemsize=2, strict_tiling=True)
    assert ds.fused_step_available(args["b_rows"], args["k"], args["w"], args["tm"],
                                   args["d"], args["f"], args["num_heads"], args["itemsize"])
    # generous budget: head fits alongside the same tile
    assert ds.head_fusion_compatible(vocab_size=124, **args)
    # shrink the budget until the headless tile still fits but the
    # head-augmented one doesn't -> gate must reject
    it0 = ds.choose_tile(16, 3, 64, 128, 384, 1536, 8, 2)
    base = ds._vmem_estimate(it0, 3, 64, 128, 384, 1536, 8, 2)
    monkeypatch.setattr(ds, "VMEM_BUDGET", base + 1)
    assert ds.fused_step_available(args["b_rows"], args["k"], args["w"], args["tm"],
                                   args["d"], args["f"], args["num_heads"], args["itemsize"])
    assert not ds.head_fusion_compatible(vocab_size=124, **args)


def test_beam_fused_head_matches_xla(setup, monkeypatch):
    """Opt-in head fusion (DecodeConfig.head_mode="1"): the last fused layer
    kernel emits log-probs directly; tokens stay identical to the XLA path."""
    params, memory, pad = setup
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "0")
    dc0 = DecodeConfig(beam_width=3, max_len=80, sos_idx=SOS, eos_idx=EOS, pad_idx=PAD)
    ref = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc0), params, memory, pad)
    monkeypatch.setenv("KHMER_OCR_FUSED_DECODE", "1")
    dc1 = DecodeConfig(beam_width=3, max_len=80, sos_idx=SOS, eos_idx=EOS, pad_idx=PAD,
                       head_mode="1")
    got = _tokens(lambda p, m, pm: beam_decode(p, m, pm, TINY, dc1), params, memory, pad)
    np.testing.assert_array_equal(got, ref)
