"""Batched beam search as fixed-K tensor lanes inside jit.

Exact reimplementation of the reference's Python beam loop
(predictor.py:101-136) as masked static-shape tensor ops:

  * step: each beam expands its top-K tokens (candidates = union of per-beam
    top-Ks, NOT a global top-K over the vocab — an off-top-K token can never be
    selected, matching `log_probs[i].topk(beam_width)`).
  * every <eos> candidate inside a beam's top-K retires to the "completed" set
    with length-normalized score ``raw / len(seq)`` (len counts <sos> and <eos>);
    only the running best completed matters, so it is tracked as a scalar per
    image instead of a list.
  * the next K beams are the best K non-eos candidates in (score, insertion)
    order — `lax.top_k`'s lowest-flat-index tie-break equals the reference's
    stable sort over beam-major candidate order.
  * final answer: best completed if any, else the current top beam
    (predictor.py:135).

The reference never early-exits for K>=2 (next_beams always refills to K), so
the loop runs the full ``max_len`` steps; we do the same for string parity.
Lanes of one image share its memory; self-attention KV caches are gathered by
parent beam each step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, ModelConfig
from ..models.layers import NEG_INF, Ctx
from ..models.ocr_model import decode_step, decode_windows, init_decode_state


def _expand_lanes(x, k):
    """(B, ...) -> (B*K, ...) repeating each row K times."""
    return jnp.repeat(x, k, axis=0)


def beam_decode(params, memory, memory_pad_mask, model_cfg: ModelConfig, dec_cfg: DecodeConfig):
    """memory: (B, T, D). Returns best tokens (B, max_len + 2) incl <sos>."""
    b = memory.shape[0]
    k = dec_cfg.beam_width
    max_len = dec_cfg.max_len
    ctx = Ctx(num_heads=model_cfg.num_heads, dropout=0.0, deterministic=True)

    mem = _expand_lanes(memory, k)
    mask = _expand_lanes(memory_pad_mask, k)
    state = init_decode_state(params, mem, mask, model_cfg)

    tokens = jnp.full((b, k, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)
    tokens = tokens.at[:, :, 0].set(dec_cfg.sos_idx)
    # Lane 0 seeds the search (reference starts with the single beam [(0.0, [sos])]).
    scores = jnp.full((b, k), NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    best_done_score = jnp.full((b,), NEG_INF, dtype=jnp.float32)
    best_done_tokens = jnp.full((b, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)

    windows = decode_windows(max_len)

    def body(pos, carry):
        tokens, scores, state, best_done_score, best_done_tokens = carry
        cur = tokens[:, :, pos].reshape(b * k)
        # staged cache window (see decode/greedy.py) — KV reads and the beam
        # reorder below only touch the active prefix
        stage = sum(jnp.int32(pos >= w) for w in windows[:-1])
        branches = [
            (lambda w: lambda st: decode_step(params, st, cur, pos, model_cfg, ctx, window=w))(w)
            for w in windows
        ]
        logits, state = jax.lax.switch(stage, branches, state)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, -1)

        top_lp, top_ids = jax.lax.top_k(logp, k)  # (B, K, K) per-beam candidates
        cand = scores[:, :, None] + top_lp
        is_eos = top_ids == dec_cfg.eos_idx

        # --- completed candidates: normalized by len(seq) = pos + 2 ------------
        norm = cand / jnp.float32(pos + 2)
        eos_norm = jnp.where(is_eos, norm, NEG_INF).max(axis=2)  # (B, K) per beam
        best_beam = jnp.argmax(eos_norm, axis=1)  # (B,)
        step_best = jnp.take_along_axis(eos_norm, best_beam[:, None], axis=1)[:, 0]
        improved = step_best > best_done_score
        done_tok = jnp.take_along_axis(tokens, best_beam[:, None, None], axis=1)[:, 0]
        done_tok = done_tok.at[:, pos + 1].set(dec_cfg.eos_idx)
        best_done_tokens = jnp.where(improved[:, None], done_tok, best_done_tokens)
        best_done_score = jnp.where(improved, step_best, best_done_score)

        # --- next beams: best K non-eos candidates -----------------------------
        flat = jnp.where(is_eos, NEG_INF, cand).reshape(b, k * k)
        new_scores, flat_idx = jax.lax.top_k(flat, k)  # ties -> lowest flat index
        parent = flat_idx // k  # (B, K)
        new_tok = jnp.take_along_axis(top_ids.reshape(b, k * k), flat_idx, axis=1)

        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        tokens = tokens.at[:, :, pos + 1].set(new_tok)

        # reorder self-attention caches by parent beam — prefix slots only
        lane_parent = (parent + jnp.arange(b)[:, None] * k).reshape(b * k)

        def reorder_with(w):
            def f(st):
                new_self = []
                for sk, sv in st["self_kv"]:
                    pk = jnp.take(sk[:, :, :w], lane_parent, axis=0)
                    pv = jnp.take(sv[:, :, :w], lane_parent, axis=0)
                    new_self.append((
                        jax.lax.dynamic_update_slice(sk, pk, (0, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(sv, pv, (0, 0, 0, 0)),
                    ))
                return {**st, "self_kv": new_self}

            return f

        state = jax.lax.switch(stage, [reorder_with(w) for w in windows], state)
        return tokens, new_scores, state, best_done_score, best_done_tokens

    tokens, scores, _, best_done_score, best_done_tokens = jax.lax.fori_loop(
        0, max_len, body, (tokens, scores, state, best_done_score, best_done_tokens)
    )
    has_done = best_done_score > NEG_INF / 2
    return jnp.where(has_done[:, None], best_done_tokens, tokens[:, 0])
