"""Batched greedy decoding inside jit via `lax.while_loop` with a KV cache.

Reference semantics (predictor.py:85-99): start at <sos>, argmax the last
position each step, stop at <eos> or after ``decode_max_len`` steps. The
reference re-runs the whole decoder over the growing prefix per image; here ALL
lanes of a batch step together through an O(1) cached decode step, and the loop
exits as soon as every lane has emitted <eos> — this whole-batch decode is where
the throughput target comes from (SURVEY.md §7).

Finished lanes keep stepping with <pad> inputs; their outputs are frozen to
<pad>, which the tokenizer skips. Argmax ties break to the lowest index, same as
torch.argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, ModelConfig
from ..models.layers import Ctx
from ..models.ocr_model import decode_step, decode_windows, init_decode_state, pack_decode_params
from ..ops.pallas.decode_step import should_use_fused


def greedy_decode(params, memory, memory_pad_mask, model_cfg: ModelConfig, dec_cfg: DecodeConfig):
    """memory: (B, T, D); returns tokens (B, max_len + 1) including leading <sos>.

    The step body is a `lax.switch` over a geometric cache-window schedule
    (32/64/.../max_len): decoding is KV-read-bound, and typical lines finish in
    well under 64 tokens — early steps read only a small static cache prefix.
    Identical outputs to a full-window decode.
    """
    b = memory.shape[0]
    max_len = dec_cfg.max_len
    ctx = Ctx(num_heads=model_cfg.num_heads, dropout=0.0, deterministic=True)
    # cache sized to this run's actual horizon, not the 256-slot positional cap
    state = init_decode_state(params, memory, memory_pad_mask, model_cfg, cache_len=max_len)
    windows = decode_windows(max_len)
    # fused Pallas step per stage: wide cache windows whose VMEM tiling does
    # not fit fall back to the XLA step for that stage only
    stage_fused = {
        w: should_use_fused(b, 1, w, memory.shape[1], memory.shape[2],
                            model_cfg.dec_ffn_dim, model_cfg.num_heads,
                            memory.dtype.itemsize, mode=dec_cfg.fused_mode)
        for w in windows
    }
    params = pack_decode_params(params, fused=any(f for f, _ in stage_fused.values()))

    tokens = jnp.full((b, max_len + 1), dec_cfg.pad_idx, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(dec_cfg.sos_idx)
    finished = jnp.zeros((b,), dtype=bool)

    def make_body(w):
        fused, interp = stage_fused[w]

        def body(carry):
            pos, tokens, finished, state = carry
            cur = tokens[:, pos]
            logits, state = decode_step(params, state, cur, pos, model_cfg, ctx, window=w,
                                        fused=fused, interpret=interp)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, dec_cfg.pad_idx, nxt)
            tokens = tokens.at[:, pos + 1].set(nxt)
            finished = finished | (nxt == dec_cfg.eos_idx)
            return pos + 1, tokens, finished, state

        return body

    # One while_loop per window stage (not a per-step `lax.switch` over
    # windows): conditional boundaries force result copies of the carried
    # caches every step; sequential stage loops carry them copy-free, and a
    # batch that finishes early skips the remaining stage loops outright.
    carry = (jnp.int32(0), tokens, finished, state)
    for w in windows:
        def cond(carry, w=w):
            pos, _, finished, _ = carry
            return (pos < min(w, max_len)) & ~jnp.all(finished)

        carry = jax.lax.while_loop(cond, make_body(w), carry)
    return carry[1]
