"""Pallas LSTM recurrence kernel: grid tiling + custom_vjp correctness.

Runs the TPU kernel in Pallas interpret mode on CPU (the same trick the rest
of the suite uses for mesh tests), with MAX_TILE shrunk so the batch-grid path
(multiple sequential tiles per launch) executes at test sizes. On real TPU the
kernel is validated bit-exact vs `lax.scan` (see docs/ARCHITECTURE.md perf
notes); here we pin semantic equality and the adjoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import khmer_ocr_tpu.ops.pallas.lstm as L
from khmer_ocr_tpu.models.bilstm import _cell_factory

H = 192  # the production hidden size (emb 384 / 2 per direction)


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(L, "MAX_TILE", 8)  # force the grid path at tiny batches


def _scan_ref(xg, w, h):
    h0 = jnp.zeros((xg.shape[0], h), xg.dtype)
    c0 = jnp.zeros((xg.shape[0], h), xg.dtype)
    (_, _), o = jax.lax.scan(_cell_factory(w), (h0, c0), xg.transpose(1, 0, 2))
    return o.transpose(1, 0, 2)


def test_gridded_kernel_matches_scan_exactly():
    rng = np.random.RandomState(0)
    b, t = 16, 5  # 2 grid tiles of 8
    xg = jnp.asarray(rng.randn(b, t, 4 * H).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    assert L.pallas_lstm_available(b, H, jnp.float32)
    assert L._round_tile(b) == 8
    out = np.asarray(L.lstm_recurrence(xg, w, H))
    ref = np.asarray(_scan_ref(xg, w, H))
    # On real TPU the kernel is bit-exact vs scan (validated: maxdiff 0.0 at
    # B=256/1024/2048, T=128). XLA:CPU contracts the scan's FMAs differently
    # than the interpreter, so allow 1-ulp here.
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_with_cell_output_matches_recurrence():
    rng = np.random.RandomState(1)
    xg = jnp.asarray(rng.randn(8, 4, 4 * H).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    h_seq, c_seq = L.lstm_recurrence(xg, w, H, with_cell=True)
    h_only = L.lstm_recurrence(xg, w, H)
    np.testing.assert_array_equal(np.asarray(h_seq), np.asarray(h_only))
    # h = o * tanh(c): |h| <= |tanh(c)| elementwise
    assert (np.abs(np.asarray(h_seq)) <= np.abs(np.tanh(np.asarray(c_seq))) + 1e-6).all()


def test_custom_vjp_matches_scan_autodiff():
    rng = np.random.RandomState(2)
    b, t = 8, 4
    xg = jnp.asarray(rng.randn(b, t, 4 * H).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    g_k = jax.grad(lambda xg, w: (L.lstm_recurrence_vjp(xg, w, H) ** 2).sum(), argnums=(0, 1))(xg, w)
    g_s = jax.grad(lambda xg, w: (_scan_ref(xg, w, H) ** 2).sum(), argnums=(0, 1))(xg, w)
    for got, ref in zip(g_k, g_s):
        got, ref = np.asarray(got), np.asarray(ref)
        np.testing.assert_allclose(got, ref, atol=2e-6 * max(np.abs(ref).max(), 1.0))


def test_availability_gate():
    assert not L.pallas_lstm_available(8, H, jnp.bfloat16)  # f32 only
    assert not L.pallas_lstm_available(12, H, jnp.float32)  # batch must be 8-aligned
    assert L.pallas_lstm_available(8, H, jnp.float32)
    assert L.pallas_lstm_available(40, H, jnp.float32)  # 5 grid tiles of 8
