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
    step's parent selection (a full prefix copy per step), an image-local
    lineage table ``lineage[b, l, t] = lane (0..K-1) that wrote slot t of lane
    l's history`` is carried, and the self-attention read gathers through it
    (models/layers.py::_attend_beam) — the gather rides the read the attention
    performs anyway. Three gather-free selection schemes (one-hot K/V
    multiply-add, per-parent logit select, joint union-softmax) were
    benchmarked on v5e and all lost to the straight gather at K=3.
  * **Stage-sequential window loops.** One `lax.while_loop` per cache-window
    stage instead of a per-step `lax.switch`: conditional boundaries force
    result copies of the carried KV caches every step; sequential stage loops
    carry them copy-free and let an early-exiting batch skip later stages.
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
from ..models.ocr_model import decode_step, decode_windows, init_decode_state, pack_decode_params
from ..ops.pallas.decode_step import should_use_fused


def _onehot_combine(sel, x):
    """``sum_p sel[b, l, p] * x[b, p, ...]`` — a K-term multiply-add standing in
    for a small axis-1 gather (TPU-hostile)."""
    extra = (1,) * (x.ndim - 2)  # x[:, None] has ndim x.ndim + 1; sel has 3
    return jnp.sum(sel.astype(x.dtype).reshape(sel.shape + extra) * x[:, None], axis=2)


_BIG = 2**30


def topk_iter(x, k: int):
    """`lax.top_k` built from k (max, lowest-index-on-ties, mask) passes.

    Bit-identical to `jax.lax.top_k` including the lowest-index tie-break
    (verified against it under ties in tests/test_beam_ties.py) — but ~17x
    faster per step on TPU: XLA lowers TopK to a full variadic sort, which
    measured 187 us/step of the beam loop's bookkeeping at (128, 3, 124);
    these masked max passes run it in ~11 us (round-3 step-budget split,
    docs/NEXT_STEPS.md). Same trick the decode megakernel uses in-kernel
    (ops/pallas/decode_loop.py). Only sensible for small static k."""
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        m = jnp.max(cur, axis=-1, keepdims=True)
        i = jnp.min(jnp.where(cur == m, cols, _BIG), axis=-1, keepdims=True)
        vals.append(m)
        idxs.append(i)
        cur = jnp.where(cols == i, NEG_INF, cur)
    return jnp.concatenate(vals, -1), jnp.concatenate(idxs, -1)


def beam_decode(params, memory, memory_pad_mask, model_cfg: ModelConfig, dec_cfg: DecodeConfig):
    """memory: (B, T, D). Returns best tokens (B, max_len + 2) incl <sos>."""
    b = memory.shape[0]
    k = dec_cfg.beam_width
    max_len = dec_cfg.max_len

    # whole-decode megakernel: every step in ONE Pallas launch, self-KV caches
    # VMEM-resident for the entire decode (ops/pallas/decode_loop.py). Token-
    # exact with the loop below (tests/test_decode_loop.py); gated to its
    # envelope (Tm<=128, max_len<=64, tile-divisible batch) — else fall through.
    from ..ops.pallas.decode_loop import fused_beam_decode, should_use_megakernel

    use_mega, mega_interp = should_use_megakernel(
        b * k, k, max_len, memory.shape[1], memory.shape[2], model_cfg.dec_ffn_dim,
        model_cfg.num_heads, model_cfg.vocab_size, memory.dtype.itemsize,
        mode=dec_cfg.mega_mode,
    )
    if use_mega:
        return fused_beam_decode(params, memory, memory_pad_mask, model_cfg, dec_cfg,
                                 interpret=mega_interp)

    ctx = Ctx(num_heads=model_cfg.num_heads, dropout=0.0, deterministic=True)

    # memory K/V stay ONE copy per image — lanes read them through grouped
    # cross-attention (K x less HBM traffic); self caches are per lane. The
    # cache is sized to this run's horizon, not the 256-slot positional cap.
    state = init_decode_state(params, memory, memory_pad_mask, model_cfg, lanes=k,
                              cache_len=max_len)
    windows = decode_windows(max_len)
    # per-stage fused decision (wide windows fall back to the XLA step)
    _stage_fused = {
        w: should_use_fused(b * k, k, w, memory.shape[1], memory.shape[2],
                            model_cfg.dec_ffn_dim, model_cfg.num_heads,
                            memory.dtype.itemsize, mode=dec_cfg.fused_mode)
        for w in windows
    }
    _any_fused = any(f for f, _ in _stage_fused.values())
    # OPT-IN head fusion (out-proj + log-softmax inside the last layer's
    # kernel): measured PAR-to-slightly-slower than XLA's head ops on v5e
    # (config.py::DecodeConfig.head_mode), so auto stays off. BEAM-ONLY knob:
    # greedy never fuses the head. When head_mode is None the env var is read
    # at TRACE time (same fallback semantics as fused_mode inside
    # should_use_fused) — jit callers should snapshot it into
    # DecodeConfig.head_mode as the Predictor does, so a toggle between calls
    # recompiles instead of being ignored by a warm jit cache.
    import os as _os

    from ..ops.pallas.decode_step import head_fusion_compatible

    _head_env = (dec_cfg.head_mode if dec_cfg.head_mode is not None
                 else _os.environ.get("KHMER_OCR_FUSED_HEAD"))
    _use_head = _any_fused and _head_env == "1"
    if _use_head:
        # the head adds VMEM (vp-padded out-proj weights + logp block) to the
        # LAST layer's kernel only; require every fused stage to admit the
        # SAME tile with the head's vp as without, else the vp=0 gate above
        # could pass while the head-augmented choose_tile trips its assert
        # (or silently shrinks the last layer's tile)
        _use_head = all(
            head_fusion_compatible(b * k, k, w, memory.shape[1], memory.shape[2],
                                   model_cfg.dec_ffn_dim, model_cfg.num_heads,
                                   memory.dtype.itemsize, model_cfg.vocab_size,
                                   strict_tiling=not interp)
            for w, (f, interp) in _stage_fused.items() if f
        )
    params = pack_decode_params(params, fused=_any_fused,
                                head_dtype=memory.dtype if _use_head else None)

    tokens = jnp.full((b, k, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)
    tokens = tokens.at[:, :, 0].set(dec_cfg.sos_idx)
    # Lane 0 seeds the search (reference starts with the single beam [(0.0, [sos])]).
    scores = jnp.full((b, k), NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    best_done_score = jnp.full((b,), NEG_INF, dtype=jnp.float32)
    best_done_tokens = jnp.full((b, max_len + 2), dec_cfg.pad_idx, dtype=jnp.int32)
    # lineage[b, l, t]: IMAGE-LOCAL lane (0..K-1) that wrote self-KV slot t of
    # lane l's history. Columns >= pos are unset garbage — reads mask them
    # (slot pos itself reads as self).
    cache_len = state["self_kv"][0][0].shape[1]
    lineage = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, cache_len))

    lane_ids = jnp.arange(k, dtype=jnp.int32)

    def make_body(w):
        fused, interp = _stage_fused[w]

        def body(carry):
            pos, tokens, scores, state, lineage, best_done_score, best_done_tokens = carry
            cur = tokens[:, :, pos].reshape(b * k)
            if fused:
                # the fused kernel takes image-local parents and patches slot
                # `pos` to self in-kernel; with head fusion the LAST layer's
                # kernel also emits the log-probs directly (padded vocab
                # columns arrive ~NEG_INF and can never win a top-k)
                out, state = decode_step(params, state, cur, pos, model_cfg, ctx, window=w,
                                         fused=True, interpret=interp, head=_use_head,
                                         lineage_local=lineage[:, :, :w].reshape(b * k, w))
                if _use_head:
                    logp = out.reshape(b, k, -1)
                else:
                    logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1).reshape(b, k, -1)
            else:
                # absolute parent pointers for this step's K/V gather: slot `pos`
                # (just written by self) maps to self; earlier slots route via
                # lineage; slots > pos are garbage but masked by the attention.
                lin_abs = (lineage[:, :, :w] + k * jnp.arange(b, dtype=jnp.int32)[:, None, None])
                lin_abs = lin_abs.reshape(b * k, w)
                own_abs = jnp.arange(b * k, dtype=jnp.int32)[:, None]
                idx = jnp.where(jnp.arange(w)[None, :] == pos, own_abs, lin_abs)
                logits, state = decode_step(params, state, cur, pos, model_cfg, ctx, window=w,
                                            lineage_idx=idx)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, -1)

            top_lp, top_ids = topk_iter(logp, k)  # (B, K, K) per-beam candidates
            cand = scores[:, :, None] + top_lp
            is_eos = top_ids == dec_cfg.eos_idx

            # --- completed candidates: normalized by len(seq) = pos + 2 --------
            norm = cand / jnp.float32(pos + 2)
            eos_norm = jnp.where(is_eos, norm, NEG_INF).max(axis=2)  # (B, K) per beam
            best_beam = jnp.argmax(eos_norm, axis=1)  # (B,)
            step_best = jnp.take_along_axis(eos_norm, best_beam[:, None], axis=1)[:, 0]
            improved = step_best > best_done_score
            done_sel = (best_beam[:, None] == lane_ids[None, :])[:, None, :]  # (B, 1, K)
            done_tok = _onehot_combine(done_sel, tokens)[:, 0]
            done_tok = done_tok.at[:, pos + 1].set(dec_cfg.eos_idx)
            best_done_tokens = jnp.where(improved[:, None], done_tok, best_done_tokens)
            best_done_score = jnp.where(improved, step_best, best_done_score)

            # --- next beams: best K non-eos candidates -------------------------
            flat = jnp.where(is_eos, NEG_INF, cand).reshape(b, k * k)
            new_scores, flat_idx = topk_iter(flat, k)  # ties -> lowest flat index
            parent = (flat_idx // k).astype(jnp.int32)  # (B, K) image-local
            new_tok = jnp.take_along_axis(top_ids.reshape(b, k * k), flat_idx, axis=1)

            psel = parent[:, :, None] == lane_ids[None, None, :]  # (B, K, K)
            tokens = _onehot_combine(psel, tokens)
            tokens = tokens.at[:, :, pos + 1].set(new_tok)

            # lineage update replaces the physical cache reorder: inherit the
            # parent's pointer rows, and slot `pos` (just written by the
            # parent lane) now belongs to the parent.
            lineage = _onehot_combine(psel, lineage).at[:, :, pos].set(parent)

            return pos + 1, tokens, new_scores, state, lineage, best_done_score, best_done_tokens

        return body

    def make_cond(w):
        def cond(carry):
            pos, tokens, scores, state, lineage, best_done_score, best_done_tokens = carry
            # bound on any future completion's normalized score per image (see
            # module docstring); strict improvement is required to replace
            # best_done, so exit as soon as bound <= best_done for every image.
            bound = scores.max(axis=1) / jnp.float32(max_len + 1)
            return (pos < min(w, max_len)) & ~jnp.all(bound <= best_done_score)

        return cond

    carry = (jnp.int32(0), tokens, scores, state, lineage, best_done_score, best_done_tokens)
    for w in windows:
        carry = jax.lax.while_loop(make_cond(w), make_body(w), carry)
    _, tokens, _, _, _, best_done_score, best_done_tokens = carry
    has_done = best_done_score > NEG_INF / 2
    return jnp.where(has_done[:, None], best_done_tokens, tokens[:, 0])
