"""Bidirectional LSTM context smoother as `jax.lax.scan`.

Reference: the proposed model's ``context_bilstm`` (se_model.py:228-234) — one
bidirectional layer, input D, hidden D/2 per direction, batch_first — applied to
the merged chunk memory to heal seam discontinuities between chunks.

TPU design notes:
  * The input projection ``x @ W_ih`` for ALL timesteps is hoisted out of the
    scan into one big MXU matmul; the scan carries only the (B, H) recurrent
    matmul — the minimum serial work per step.
  * The backward direction is length-aware: each row is flipped *within its
    valid length* before the scan and flipped back after, so padded bucket tails
    never contaminate valid positions. (The reference's inference path never
    pads — predictor.py:64 builds memory at exactly N*32 tokens — so this
    reproduces its semantics under static bucketed shapes.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cell_factory(w_hh):
    def cell(carry, xg):
        h, c = carry
        gates = xg + h @ w_hh  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    return cell


def lstm_scan(p, x, use_pallas: bool | None = None):
    """Unidirectional LSTM over (B, T, D) -> (B, T, H). Gate order i,f,g,o.

    The input projection runs as one MXU matmul; the recurrence runs either as
    a Pallas kernel with VMEM-resident weights and double-buffered gate DMA
    (ops/pallas/lstm.py) or as `lax.scan`. Default: Pallas on TPU when the
    shape qualifies.
    """
    b, t, _ = x.shape
    hidden = p["w_hh"].shape[0]
    xg = x @ p["w_ih"].astype(x.dtype) + (p["b_ih"] + p["b_hh"]).astype(x.dtype)  # (B, T, 4H)
    if use_pallas is None:
        use_pallas = _default_use_pallas()
    if use_pallas:
        from ..ops.pallas.lstm import lstm_recurrence_vjp, pallas_lstm_available

        # any batch size runs as ONE kernel launch: large batches tile over a
        # sequential Pallas grid inside the kernel (independent recurrences).
        # lstm_recurrence_vjp is differentiable (kernel forward, reverse-scan
        # adjoint backward), so training may take this path too.
        if pallas_lstm_available(b, hidden, jnp.float32):
            w32 = p["w_hh"].astype(jnp.float32)
            out = lstm_recurrence_vjp(xg.astype(jnp.float32), w32, hidden)
            return out.astype(x.dtype)
    h0 = jnp.zeros((b, hidden), x.dtype)
    c0 = jnp.zeros((b, hidden), x.dtype)
    (_, _), hs = jax.lax.scan(_cell_factory(p["w_hh"].astype(x.dtype)), (h0, c0), xg.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def _default_use_pallas() -> bool:
    import os

    flag = os.environ.get("KHMER_OCR_PALLAS_LSTM", "auto")
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def flip_within_length(x, lengths):
    """Reverse each (T, ...) row of x within its valid prefix length."""
    t = x.shape[1]
    pos = jnp.arange(t)[None, :]
    idx = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def bilstm_apply(p, x, lengths=None, use_pallas: bool | None = None):
    """Bidirectional LSTM: concat(forward, length-aware backward) -> (B, T, 2H).

    ``use_pallas=False`` forces the `lax.scan` path. Both paths are
    differentiable (the Pallas recurrence ships a custom_vjp); training uses
    scan by default because it measures faster at training batch sizes
    (examples/ab_pallas_lstm_train.py — KHMER_OCR_PALLAS_LSTM_TRAIN opts in).
    """
    fw = lstm_scan(p["fw"], x, use_pallas)
    if lengths is None:
        bw = jnp.flip(lstm_scan(p["bw"], jnp.flip(x, axis=1), use_pallas), axis=1)
    else:
        bw = flip_within_length(lstm_scan(p["bw"], flip_within_length(x, lengths), use_pallas), lengths)
    return jnp.concatenate([fw, bw], axis=-1)


def lstm_dir_init(rng, in_dim, hidden):
    """torch nn.LSTM default: all weights/biases U(+-1/sqrt(hidden))."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b_ih": u(k3, (4 * hidden,)),
        "b_hh": u(k4, (4 * hidden,)),
    }


def bilstm_init(rng, in_dim, hidden):
    kf, kb = jax.random.split(rng)
    return {"fw": lstm_dir_init(kf, in_dim, hidden), "bw": lstm_dir_init(kb, in_dim, hidden)}
