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

Performance design (round-1 VERDICT next-steps #1-2):

  * **Pointer-table lineage instead of cache reorder.** Beams share prefixes;
    instead of physically re-gathering every layer's K/V prefix after each
    step's parent selection (a full prefix copy per step), a lineage table
    ``lineage[l, t] = lane that wrote slot t of lane l's history`` is carried,
    and the self-attention read gathers through it (models/layers.py
    decoder_layer_step) — the gather rides the read the attention performs
    anyway, halving per-step HBM traffic.
  * **Provably-safe early exit.** Per-step logprobs are <= 0, so an active
    beam with raw score ``s`` can never complete with normalized score above
    ``s / (max_len + 1)`` (raw only decreases; the denominator — final
    sequence length — is at most max_len + 1... the LARGEST it can get, which
    maximizes s/L for s <= 0). Once every image's best such bound no longer
    exceeds its best completed score, no future step can change any answer and
    the whole batch exits. Outputs are bit-identical to the full
    ``max_len``-step run the reference performs (its loop never refills below
    K beams so it never exits on its own, predictor.py:126-133).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, ModelConfig
from ..models.layers import NEG_INF, Ctx
from ..models.ocr_model import decode_step, decode_windows, init_decode_state


def beam_decode(params, memory, memory_pad_mask, model_cfg: ModelConfig, dec_cfg: DecodeConfig):
    """memory: (B, T, D). Returns best tokens (B, max_len + 2) incl <sos>."""
    b = memory.shape[0]
    k = dec_cfg.beam_width
    max_len = dec_cfg.max_len
    ctx = Ctx(num_heads=model_cfg.num_heads, dropout=0.0, deterministic=True)

    # memory K/V stay ONE copy per image — lanes read them through grouped
    # cross-attention (K x less HBM traffic); self caches are per lane.
    state = init_decode_state(params, memory, memory_pad_mask, model_cfg, lanes=k)

    tokens = jnp.full((b, k, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)
    tokens = tokens.at[:, :, 0].set(dec_cfg.sos_idx)
    # Lane 0 seeds the search (reference starts with the single beam [(0.0, [sos])]).
    scores = jnp.full((b, k), NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    best_done_score = jnp.full((b,), NEG_INF, dtype=jnp.float32)
    best_done_tokens = jnp.full((b, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)
    # lineage[l, t]: lane that wrote self-KV slot t of lane l's history. Columns
    # >= pos are unset garbage — reads mask them (slot pos itself reads as self).
    cache_len = state["self_kv"][0][0].shape[2]
    lineage = jnp.broadcast_to(jnp.arange(b * k, dtype=jnp.int32)[:, None], (b * k, cache_len))

    windows = decode_windows(max_len)

    def cond(carry):
        pos, tokens, scores, state, lineage, best_done_score, best_done_tokens = carry
        # bound on any future completion's normalized score per image (see module
        # docstring); strict improvement is required to replace best_done, so
        # exit as soon as bound <= best_done for every image.
        bound = scores.max(axis=1) / jnp.float32(max_len + 1)
        return (pos < max_len) & ~jnp.all(bound <= best_done_score)

    def body(carry):
        pos, tokens, scores, state, lineage, best_done_score, best_done_tokens = carry
        cur = tokens[:, :, pos].reshape(b * k)
        # staged cache window (see decode/greedy.py) — KV reads touch only the
        # active prefix
        stage = sum(jnp.int32(pos >= w) for w in windows[:-1])
        branches = [
            (lambda w: lambda st: decode_step(params, st, cur, pos, model_cfg, ctx, window=w,
                                              lineage=lineage))(w)
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

        # lineage update replaces the physical cache reorder: inherit the
        # parent's pointer rows, and slot `pos` (just written by the parent
        # lane) now belongs to the parent.
        lane_parent = (parent + jnp.arange(b)[:, None] * k).reshape(b * k).astype(jnp.int32)
        lineage = jnp.take(lineage, lane_parent, axis=0).at[:, pos].set(lane_parent)

        return pos + 1, tokens, new_scores, state, lineage, best_done_score, best_done_tokens

    carry = (jnp.int32(0), tokens, scores, state, lineage, best_done_score, best_done_tokens)
    _, tokens, _, _, _, best_done_score, best_done_tokens = jax.lax.while_loop(cond, body, carry)
    has_done = best_done_score > NEG_INF / 2
    return jnp.where(has_done[:, None], best_done_tokens, tokens[:, 0])
