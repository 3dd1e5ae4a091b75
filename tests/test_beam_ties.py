"""Tie-break equivalence stress for the jitted beam search.

`decode/beam.py` claims `lax.top_k`'s lowest-flat-index tie-break over
beam-major candidates reproduces the reference's stable Python sort
(predictor.py:124-135). This test forces EXACT score ties — the adversarial
case for that claim — by zeroing the decoder's output projection so logits are
a constant bias vector at every step/lane, and compares against a pure-Python
reimplementation of the reference loop (round-1 VERDICT weak #6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
from khmer_ocr_tpu.decode import beam_decode
from khmer_ocr_tpu.models.ocr_model import init_model

TINY = ModelConfig(vocab_size=8, emb_dim=32, num_heads=4, enc_layers=1, dec_layers=2,
                   enc_ffn_dim=64, max_global_len=64, decode_max_len=16,
                   backbone="se_vgg")


def py_reference_beam(logp, k, max_len, sos=2, eos=3):
    """predictor._beam_search (predictor.py:101-136) with constant per-step
    log-probs: Python-float scores, torch-topk lowest-index tie order, stable
    descending sort over beam-major candidates."""
    beams = [(0.0, [sos])]
    completed = []
    top = np.argsort(-logp, kind="stable")[:k]  # ties -> lowest index, like torch.topk
    for _ in range(max_len):
        candidates = []
        for score, seq in beams:
            for idx in top:
                candidates.append((score + float(logp[idx]), seq + [int(idx)]))
        candidates.sort(key=lambda c: c[0], reverse=True)  # stable
        next_beams = []
        for s, seq in candidates:
            if seq[-1] == eos:
                completed.append((s / len(seq), seq))
            elif len(next_beams) < k:
                next_beams.append((s, seq))
        beams = next_beams
        if not beams:
            break
    if completed:
        return sorted(completed, key=lambda c: c[0], reverse=True)[0][1]
    return beams[0][1]


def _run_ours(bias, k, max_len):
    params, _ = init_model(jax.random.PRNGKey(0), TINY)
    params["dec"]["out"]["w"] = jnp.zeros_like(params["dec"]["out"]["w"])
    params["dec"]["out"]["b"] = jnp.asarray(bias, jnp.float32)
    memory = jax.random.normal(jax.random.PRNGKey(1), (1, 8, TINY.emb_dim), jnp.float32)
    pad = jnp.zeros((1, 8), bool)
    dec_cfg = DecodeConfig(beam_width=k, max_len=max_len)
    out = np.asarray(beam_decode(params, memory, pad, TINY, dec_cfg))[0]
    got = [int(t) for t in out]
    # canonical form: strip trailing pads, keep through eos if present
    while got and got[-1] == 0:
        got.pop()
    return got


def _logp(bias):
    b = np.asarray(bias, np.float64)
    return b - np.log(np.exp(b - b.max()).sum()) - b.max()


def _canon_ref(seq):
    return seq  # reference returns [sos, ..., (eos)] already


CASES = {
    # tokens 0(pad)/1/2(sos) suppressed; ties among the rest incl. eos=3
    "all_tied": [-30, -30, -30, 0.0, 0.0, 0.0, 0.0, 0.0],
    "top2_tied_eos_third": [-30, -30, -30, 0.5, 1.0, 1.0, 0.2, 0.1],
    "eos_tied_with_best": [-30, -30, -30, 1.0, 1.0, 0.3, 0.2, 0.1],
    "distinct": [-30, -30, -30, 0.4, 1.2, 0.8, 0.1, -0.5],
    "pairwise_ties": [-30, -30, -30, 0.7, 0.7, 0.3, 0.3, 0.0],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("k", [2, 3, 5])
def test_beam_tie_break_matches_reference(name, k):
    bias = CASES[name]
    max_len = 12
    ref = py_reference_beam(_logp(bias), k, max_len)
    got = _run_ours(bias, k, max_len)
    assert got == _canon_ref(ref), f"{name} k={k}: {got} != {ref}"


@pytest.mark.parametrize("shape", [(128, 3, 124), (128, 9), (7, 5, 33)])
@pytest.mark.parametrize("k", [1, 3, 5])
def test_topk_iter_matches_lax_topk_under_ties(shape, k):
    """topk_iter (beam.py) must be BIT-identical to lax.top_k including the
    lowest-index tie-break — it replaces XLA's sort-based TopK in the beam
    loop (187 -> 11 us/step on v5e; docs/NEXT_STEPS.md round-3 findings)."""
    from khmer_ocr_tpu.decode.beam import topk_iter

    if k > shape[-1]:
        pytest.skip("k exceeds axis")
    rng = np.random.RandomState(0)
    # heavy ties: one-decimal grid, plus constant rows / plateaued blocks
    x = np.round(rng.randn(*shape), 1).astype(np.float32)
    x[..., : shape[-1] // 3] = x[..., :1]
    xv = jnp.asarray(x)
    v_ref, i_ref = jax.lax.top_k(xv, k)
    v_got, i_got = jax.jit(lambda a: topk_iter(a, k))(xv)
    assert np.array_equal(np.asarray(v_ref), np.asarray(v_got))
    assert np.array_equal(np.asarray(i_ref), np.asarray(i_got))
