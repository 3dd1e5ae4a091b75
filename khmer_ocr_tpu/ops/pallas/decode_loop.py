"""Whole-decode beam-search megakernel: ALL decode steps in ONE Pallas launch.

STATUS: ARCHIVED EXPERIMENT, opt-in only (KHMER_OCR_MEGA_DECODE=1). Built to
answer "does one launch beat per-step launches?" — the answer on v5e was NO:
it measured device-time PAR against the round-3 448-us-era per-step fused
path (30.6 vs 29.9 ms/decode, B=128 beam-3 Tm=128 64 steps) at ~10x the
compile cost, because XLA's while_loop had already amortized the per-step
launches; and the per-step path has since dropped to 264 us/step (sort-free
top-k), so as of round 4 this kernel is ~1.8x SLOWER than the default path.
It also lacks the per-step path's provably-safe early exit (always runs
max_len steps). Kept because its parity tests pin the in-kernel top-k /
lineage constructions the per-step path borrows, and as the measured data
point that more fusion only serializes once launches amortize. If revisited,
re-derive from the current decode_step.py kernel; do not trust the envelope
numbers below as current.

Design (as built): the per-step fused kernel (decode_step.py) pays, every
step, for (a) the self-KV cache round-trip through HBM, (b) per-step launch +
XLA glue for the embed / out-projection / top-k / lineage bookkeeping, and
(c) a fresh pass over the layer weights per launch. This kernel runs the
ENTIRE beam decode for a tile of images inside one launch:

  * self-KV caches live in VMEM scratch for the whole decode — ZERO cache HBM
    traffic (the dominant per-step cost at 384+ lanes);
  * memory cross-K/V load once per tile, not once per step;
  * attention/layer weights resident across the step loop; only the FFN
    matrices (l1/l2, 4.7 MB of the 8.9 MB total) stream from HBM per
    (layer, step) through an async-copy scratch buffer. (This FFN-streaming
    split was designed against Mosaic's DEFAULT ~16 MB vmem limit; the later
    VMEM probe showed ~124 MB scoped VMEM is usable — examples/probe_vmem.py
    — so a resident-FFN variant is possible, but the PAR measurement above
    says the launch-count premise is wrong, not the VMEM split);
  * embedding (one-hot MXU matmul), out-projection, log-softmax, per-beam
    top-K, completion tracking, and pointer-lineage updates all happen
    in-kernel — no per-step XLA ops at all.

Beam semantics are the EXACT ones of decode/beam.py (reference
predictor.py:101-136): per-beam top-K candidates (not global), <eos>
candidates retire with length-normalized score raw/(pos+2) and strict
improvement, next beams are the best K non-eos candidates with
lowest-flat-index tie-break (replicated here by iterative max + min-index),
final answer is the best completed else lane 0. Tokens must match the XLA
beam token-for-token (tests/test_decode_loop.py).

Envelope (strict TPU gate): beam lanes k >= 2, memory Tm <= 128 resident,
max_len <= 64 (the full window is resident — no stage schedule), image tile
It = 8 with It*k divisible by 8. Outside it, decode/beam.py keeps the per-step
path. Early exit is NOT implemented in-kernel (the loop always runs max_len
steps); the per-step path's provably-safe exit only fires with real weights on
short lines, where decode is cheap anyway — revisit if profiles say otherwise.

Mosaic constraints honored (docs/NEXT_STEPS.md "Mosaic gotchas"): no dynamic
sublane stores at traced indices (8-aligned block writes + value-level where
patches), int32 iotas reshaped before comparison, no batched dot_general
(folded 2D matmuls with (D, H) 0/1 segment operands), scalar top-k replaced by
iterative max + min-index over padded (It, 16) lanes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .decode_step import VMEM_BUDGET

NEG_INF = -1e30
LN_EPS = 1e-5
_PREC = jax.lax.Precision.DEFAULT

_RESIDENT_FIELDS = (
    "qkv_w", "qkv_b", "so_w", "so_b", "ln1_s", "ln1_b",
    "cq_w", "cq_b", "co_w", "co_b", "ln2_s", "ln2_b",
    "l1_b", "l2_b", "ln3_s", "ln3_b",
)
_STREAMED_FIELDS = ("l1_w", "l2_w")


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _stage_windows(max_len: int, w: int) -> tuple[int, ...]:
    """Static cache-window stages: 8-aligned geometric schedule capped at the
    full window ``w`` (mirrors models.ocr_model.decode_windows, base 32)."""
    stages = []
    we = 32
    while we < max_len:
        stages.append(min(_round_up(we, 8), w))
        we *= 2
    stages.append(w)
    return tuple(dict.fromkeys(stages))


def megakernel_available(b_imgs: int, k: int, max_len: int, tm: int, d: int, f: int,
                         num_heads: int, vocab: int, itemsize: int) -> bool:
    """Strict envelope for the whole-decode kernel (see module docstring)."""
    if k < 2 or b_imgs <= 0:
        return False
    if d % num_heads or vocab > 128:
        return False
    if tm > 128 or max_len > 64:
        return False
    it = 8
    if b_imgs % it or (it * k) % 8:
        return False
    w = _round_up(max_len, 8)
    bt = it * k
    # analytic VMEM estimate (same philosophy as decode_step.choose_tile)
    n_layers = 2  # estimate at the production depth; deeper models re-gate below
    caches = 2 * n_layers * bt * w * d * itemsize
    mem = 2 * n_layers * it * tm * d * itemsize
    resident_w = n_layers * itemsize * (3 * d * d + 2 * d * d + d * d + 9 * d + f)
    embed_out = itemsize * (128 * d + _round_up(max_len + 2, 8) * d + d * 128)
    ffn_buf = itemsize * (d * f + f * d)
    interm = bt * d * 4 * 6 + bt * 128 * 4 * 2 + 2 * bt * w * d * itemsize + bt * f * 4
    return caches + mem + resident_w + embed_out + ffn_buf + interm <= VMEM_BUDGET


def should_use_megakernel(b_rows: int, k: int, max_len: int, tm: int, d: int, f: int,
                          num_heads: int, vocab: int, itemsize: int,
                          mode: str | None = None) -> tuple[bool, bool]:
    """Trace-time policy mirroring decode_step.should_use_fused: (use, interpret).

    KHMER_OCR_MEGA_DECODE: "1" opt-in (interpreter off-TPU, for tests);
    default OFF — measured at device-time par with the per-step fused path on
    v5e but ~10x the compile cost (see below). The flag rides
    DecodeConfig.fused_mode's sibling env var and is snapshotted the same way
    by the Predictor."""
    import os

    env = os.environ.get("KHMER_OCR_MEGA_DECODE") if mode is None else mode
    if env != "1":
        # OPT-IN only (measured v5e, B=128 images, Tm=128, beam-3, 64 steps):
        # the megakernel decoded in 30.6 ms vs the THEN-current (round-3,
        # 448 us/step) per-step fused path's 29.9 ms — device-time par —
        # while compiling ~10x slower (18.7 s vs 1.7 s). The per-step path
        # has since dropped to 264 us/step (sort-free top-k), making the
        # megakernel ~1.8x slower than production as of round 4 — it is an
        # archived experiment (see module docstring), kept for its parity
        # tests and for shapes/hardware where one-launch decode may win.
        return False, False
    backend = jax.default_backend()
    if b_rows % max(k, 1):
        return False, False
    strict = backend == "tpu"
    if not strict:
        # interpreter path (tests): any small shape goes
        return k >= 2 and vocab <= 128 and tm <= 128 and max_len <= 64, True
    ok = megakernel_available(b_rows // k, k, max_len, tm, d, f, num_heads, vocab, itemsize)
    return ok, False


def _kernel_factory(it: int, k: int, n_layers: int, w: int, lp_: int, tm: int, d: int,
                    h: int, f: int, vp: int, v: int, max_len: int, eos: int,
                    sos: int, pad: int, cdt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt = it * k
    hd = d // h
    f32 = jnp.float32
    i32 = jnp.int32
    inv_sqrt_hd = 1.0 / math.sqrt(hd)
    BIG = 2**30  # Python int: a jnp scalar here would be captured as a const

    def ln(x, s_ref, b_ref):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * s_ref[...].astype(f32) + b_ref[...].astype(f32)

    def softmax1(x):
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        return e / jnp.sum(e, axis=1, keepdims=True)

    def kernel(*refs):
        # ---- operand unpack (order built in fused_beam_decode) -------------
        idx = 0

        def take(n):
            nonlocal idx
            out = refs[idx:idx + n]
            idx += n
            return out

        (emb_ref, pos_ref, out_w_ref, out_b_ref) = take(4)
        mem_refs = [take(2) for _ in range(n_layers)]        # (k, v) per layer
        (mvalid_ref,) = take(1)
        res_refs = [dict(zip(_RESIDENT_FIELDS, take(len(_RESIDENT_FIELDS))))
                    for _ in range(n_layers)]
        ffn_refs = [dict(zip(_STREAMED_FIELDS, take(len(_STREAMED_FIELDS))))
                    for _ in range(n_layers)]                # HBM (ANY space)
        (tok_out_ref,) = take(1)
        cache_refs = [take(2) for _ in range(n_layers)]      # scratch (k, v)
        (toks_ref, lineage_ref, bdt_ref, l1_buf, l2_buf, l1_sem, l2_sem) = take(7)
        assert idx == len(refs), (idx, len(refs))

        # constant segment matrices (merged-head attention, decode_step.py)
        seg_dh = (jax.lax.broadcasted_iota(i32, (d, h), 0) // hd
                  == jax.lax.broadcasted_iota(i32, (d, h), 1)).astype(f32)
        seg_hd = (jax.lax.broadcasted_iota(i32, (h, d), 0)
                  == jax.lax.broadcasted_iota(i32, (h, d), 1) // hd).astype(f32)
        seg_c = seg_dh.astype(cdt)
        segT_c = seg_hd.astype(cdt)

        col_lp = jax.lax.broadcasted_iota(i32, (bt, lp_), 1)       # token columns
        col_v = jax.lax.broadcasted_iota(i32, (bt, vp), 1)         # vocab lanes
        lane_of_row = jax.lax.broadcasted_iota(i32, (bt, 1), 0) % k
        col16 = jax.lax.broadcasted_iota(i32, (it, 16), 1)
        lane_ik = jax.lax.broadcasted_iota(i32, (it, k), 1)

        # ---- init state -----------------------------------------------------
        toks_ref[...] = jnp.where(col_lp == 0, jnp.int32(sos), jnp.int32(pad))
        lineage_ref[...] = lane_of_row * jnp.ones((bt, w), i32)
        bdt_ref[...] = jnp.full((it, lp_), pad, i32)
        for kc, vc in cache_refs:
            kc[...] = jnp.zeros((bt, w, d), cdt)
            vc[...] = jnp.zeros((bt, w, d), cdt)

        scores0 = jnp.where(lane_ik == 0, 0.0, NEG_INF).astype(f32)   # (It, K)
        best0 = jnp.full((it, 1), NEG_INF, f32)

        mvf = mvalid_ref[...]                                          # (It, Tm)
        mem_ok = (mvf[:, :, None] > 0)

        def start_ffn_dma(li):
            cp1 = pltpu.make_async_copy(ffn_refs[li]["l1_w"], l1_buf, l1_sem)
            cp2 = pltpu.make_async_copy(ffn_refs[li]["l2_w"], l2_buf, l2_sem)
            cp1.start()
            cp2.start()
            return cp1, cp2

        def make_step_body(we):
            """Step body specialized to a static cache-window stage ``we``
            (multiple of 8, >= the stage's max step+1): attention touches only
            the first ``we`` cache slots — the geometric window schedule the
            per-step path uses (decode_windows), in-kernel."""
            col_w = jax.lax.broadcasted_iota(i32, (bt, we), 1)
            t_iota_3 = jax.lax.broadcasted_iota(i32, (bt, we, 1), 1)

            def step_body(step, carry):
                scores, best_score = carry  # (It, K) f32, (It, 1) f32

                # -- current input token (value-level dynamic column read) ---
                toks = toks_ref[...]                                  # (Bt, Lp)
                cur = jnp.sum(jnp.where(col_lp == step, toks, 0), axis=1,
                              keepdims=True)                          # (Bt, 1)

                # -- embedding: one-hot MXU matmul + positional row ----------
                oh = (col_v == cur).astype(cdt)                       # (Bt, Vp)
                x = jnp.dot(oh, emb_ref[...], preferred_element_type=f32,
                            precision=_PREC)                          # (Bt, D)
                prow_iota = jax.lax.broadcasted_iota(i32, (lp_, 1), 0)
                prow = jnp.sum(jnp.where(prow_iota == step, pos_ref[...].astype(f32), 0.0),
                               axis=0, keepdims=True)                 # (1, D)
                x = (x + prow).astype(cdt)

                lin = lineage_ref[:, :we]                             # (Bt, we)

                for li in range(n_layers):
                    res = res_refs[li]
                    kc_ref, vc_ref = cache_refs[li]
                    cp1, cp2 = start_ffn_dma(li)

                    xin = x
                    xf = xin.astype(f32)
                    # packed self-QKV + cache write (8-aligned block store)
                    qkv = jnp.dot(xin, res["qkv_w"][...], preferred_element_type=f32,
                                  precision=_PREC) + res["qkv_b"][...].astype(f32)
                    q_t = qkv[:, :d]
                    k_t = qkv[:, d:2 * d].astype(cdt)
                    v_t = qkv[:, 2 * d:].astype(cdt)
                    start = pl.multiple_of((step // 8) * 8, 8)
                    t8 = start + jax.lax.broadcasted_iota(i32, (bt, 8, 1), 1)
                    patch8 = t8 == step
                    kc_ref[:, pl.ds(start, 8), :] = jnp.where(
                        patch8, k_t[:, None, :], kc_ref[:, pl.ds(start, 8), :])
                    vc_ref[:, pl.ds(start, 8), :] = jnp.where(
                        patch8, v_t[:, None, :], vc_ref[:, pl.ds(start, 8), :])

                    k_win = kc_ref[:, :we, :]
                    v_win = vc_ref[:, :we, :]
                    # pointer-lineage select (slot `step` belongs to self)
                    lin_here = jnp.where(col_w == step, lane_of_row, lin)
                    lin4 = lin_here.reshape(it, k, we)[..., None]
                    k4 = k_win.reshape(it, k, we, d)
                    v4 = v_win.reshape(it, k, we, d)
                    k_read = jnp.zeros_like(k4)
                    v_read = jnp.zeros_like(v4)
                    for p in range(k):
                        sel = lin4 == p
                        k_read = jnp.where(sel, k4[:, p:p + 1], k_read)
                        v_read = jnp.where(sel, v4[:, p:p + 1], v_read)
                    k_read = k_read.reshape(bt, we, d)
                    v_read = v_read.reshape(bt, we, d)

                    prod = k_read * q_t.astype(cdt)[:, None, :]
                    logits = jnp.dot(prod.reshape(bt * we, d), seg_c,
                                     preferred_element_type=f32,
                                     precision=_PREC).reshape(bt, we, h) * inv_sqrt_hd
                    logits = jnp.where(t_iota_3 <= step, logits, NEG_INF)
                    attn = softmax1(logits)
                    a_exp = jnp.dot(attn.astype(cdt).reshape(bt * we, h), segT_c,
                                    preferred_element_type=f32,
                                    precision=_PREC).reshape(bt, we, d).astype(cdt)
                    sa = jnp.sum(a_exp * v_read, axis=1, dtype=f32)
                    sa = jnp.dot(sa.astype(cdt), res["so_w"][...],
                                 preferred_element_type=f32, precision=_PREC) \
                        + res["so_b"][...].astype(f32)
                    xf = ln(xf + sa, res["ln1_s"], res["ln1_b"])

                    # grouped cross-attention (resident memory K/V)
                    qc = jnp.dot(xf.astype(cdt), res["cq_w"][...],
                                 preferred_element_type=f32, precision=_PREC) \
                        + res["cq_b"][...].astype(f32)
                    qc3 = qc.astype(cdt).reshape(it, k, d)
                    mem_kc = mem_refs[li][0][...]
                    mem_vc = mem_refs[li][1][...]
                    ca_lanes = []
                    for p in range(k):
                        cprod = mem_kc * qc3[:, p][:, None, :]
                        cl = jnp.dot(cprod.reshape(it * tm, d), seg_c,
                                     preferred_element_type=f32,
                                     precision=_PREC).reshape(it, tm, h)
                        cl = jnp.where(mem_ok, cl * inv_sqrt_hd, NEG_INF)
                        cattn = softmax1(cl)
                        ce = jnp.dot(cattn.astype(cdt).reshape(it * tm, h), segT_c,
                                     preferred_element_type=f32,
                                     precision=_PREC).reshape(it, tm, d).astype(cdt)
                        ca_lanes.append(jnp.sum(ce * mem_vc, axis=1, dtype=f32)[:, None, :])
                    ca = (ca_lanes[0] if k == 1 else
                          jnp.concatenate(ca_lanes, axis=1)).reshape(bt, d)
                    ca = jnp.dot(ca.astype(cdt), res["co_w"][...],
                                 preferred_element_type=f32, precision=_PREC) \
                        + res["co_b"][...].astype(f32)
                    xf = ln(xf + ca, res["ln2_s"], res["ln2_b"])

                    # FFN (streamed weights)
                    cp1.wait()
                    cp2.wait()
                    h1 = jnp.dot(xf.astype(cdt), l1_buf[...],
                                 preferred_element_type=f32, precision=_PREC) \
                        + res["l1_b"][...].astype(f32)
                    h1 = jnp.maximum(h1, 0.0)
                    h2 = jnp.dot(h1.astype(cdt), l2_buf[...],
                                 preferred_element_type=f32, precision=_PREC) \
                        + res["l2_b"][...].astype(f32)
                    xf = ln(xf + h2, res["ln3_s"], res["ln3_b"])
                    x = xf.astype(cdt)

                # -- out projection + masked log-softmax --------------------------
                logits_v = jnp.dot(x, out_w_ref[...], preferred_element_type=f32,
                                   precision=_PREC) + out_b_ref[...].astype(f32)
                logits_v = jnp.where(col_v < v, logits_v, NEG_INF)        # (Bt, Vp)
                m = jnp.max(logits_v, axis=1, keepdims=True)
                lse = jnp.log(jnp.sum(jnp.exp(logits_v - m), axis=1, keepdims=True)) + m
                logp = logits_v - lse

                # -- per-beam top-K (iterative max + min-index == lax.top_k) ------
                cur_lp = logp
                top_lp, top_id = [], []
                for _ in range(k):
                    mj = jnp.max(cur_lp, axis=1, keepdims=True)           # (Bt, 1)
                    ij = jnp.min(jnp.where(cur_lp == mj, col_v, BIG), axis=1,
                                 keepdims=True)                           # (Bt, 1)
                    top_lp.append(mj)
                    top_id.append(ij)
                    cur_lp = jnp.where(col_v == ij, NEG_INF, cur_lp)

                scores_bt = scores.reshape(bt, 1)
                cand = [scores_bt + top_lp[j] for j in range(k)]          # (Bt, 1) x K
                is_eos = [top_id[j] == eos for j in range(k)]

                # -- completions: best normalized eos candidate -------------------
                norm_den = (step + 2).astype(f32)
                eos_norm = jnp.full((bt, 1), NEG_INF, f32)
                for j in range(k):
                    nj = jnp.where(is_eos[j], cand[j] / norm_den, NEG_INF)
                    eos_norm = jnp.maximum(eos_norm, nj)
                eos_ik = eos_norm.reshape(it, k)                          # (It, K)
                step_best = jnp.max(eos_ik, axis=1, keepdims=True)        # (It, 1)
                best_beam = jnp.min(jnp.where(eos_ik == step_best, lane_ik, BIG),
                                    axis=1, keepdims=True)                # (It, 1)
                improved = step_best > best_score
                toks4 = toks.reshape(it, k, lp_)
                done_tok = jnp.zeros((it, lp_), i32)
                for p in range(k):
                    done_tok = jnp.where(best_beam == p, toks4[:, p], done_tok)
                done_tok = jnp.where(
                    jax.lax.broadcasted_iota(i32, (it, lp_), 1) == step + 1,
                    eos, done_tok)
                bdt_ref[...] = jnp.where(improved, done_tok, bdt_ref[...])
                best_score = jnp.where(improved, step_best, best_score)

                # -- next beams: best K non-eos of the K*K candidates -------------
                # flat layout (It, 16): col l*K + j, padded with NEG_INF
                flat_cols, id_cols = [], []
                for l in range(k):
                    for j in range(k):
                        cj = jnp.where(is_eos[j], NEG_INF, cand[j]).reshape(it, k)
                        ij = top_id[j].reshape(it, k)
                        flat_cols.append(cj[:, l:l + 1])
                        id_cols.append(ij[:, l:l + 1])
                pad_n = 16 - k * k
                flat = jnp.concatenate(
                    flat_cols + [jnp.full((it, 1), NEG_INF, f32)] * pad_n, axis=1)
                ids16 = jnp.concatenate(
                    id_cols + [jnp.zeros((it, 1), i32)] * pad_n, axis=1)  # (It, 16)

                new_scores_cols, parent_cols, newtok_cols = [], [], []
                cur_flat = flat
                for _ in range(k):
                    mr = jnp.max(cur_flat, axis=1, keepdims=True)         # (It, 1)
                    ir = jnp.min(jnp.where(cur_flat == mr, col16, BIG), axis=1,
                                 keepdims=True)                           # (It, 1)
                    tok_r = jnp.sum(jnp.where(col16 == ir, ids16, 0), axis=1,
                                    keepdims=True)
                    new_scores_cols.append(mr)
                    parent_cols.append(ir // k)
                    newtok_cols.append(tok_r)
                    cur_flat = jnp.where(col16 == ir, NEG_INF, cur_flat)
                new_scores = jnp.concatenate(new_scores_cols, axis=1)     # (It, K)
                parent = jnp.concatenate(parent_cols, axis=1)             # (It, K)
                new_tok = jnp.concatenate(newtok_cols, axis=1)            # (It, K)

                # -- reorder token history + lineage via parent pointers ----------
                newt = jnp.zeros((it, k, lp_), i32)
                lin4h = jnp.where(col_w == step, lane_of_row, lin).reshape(it, k, we)
                newlin = jnp.zeros((it, k, we), i32)
                for p in range(k):
                    selp = (parent[:, :, None] == p)
                    newt = jnp.where(selp, toks4[:, p:p + 1], newt)
                    newlin = jnp.where(selp, lin4h[:, p:p + 1], newlin)
                col_lp3 = jax.lax.broadcasted_iota(i32, (it, k, lp_), 2)
                newt = jnp.where(col_lp3 == step + 1, new_tok[:, :, None], newt)
                col_w3 = jax.lax.broadcasted_iota(i32, (it, k, we), 2)
                newlin = jnp.where(col_w3 == step, parent[:, :, None], newlin)
                toks_ref[...] = newt.reshape(bt, lp_)
                lineage_ref[:, :we] = newlin.reshape(bt, we)

                return new_scores, best_score

            return step_body


        # geometric window stages (decode_windows semantics): steps [lo, hi)
        # run with a static cache window we >= hi, so early steps never sweep
        # the full max_len window
        carry = (scores0, best0)
        lo = 0
        for we in _stage_windows(max_len, w):
            hi = min(we, max_len)
            carry = jax.lax.fori_loop(lo, hi, make_step_body(we), carry)
            lo = hi
        scores, best_score = carry

        # ---- final: best completed else lane 0 ------------------------------
        has_done = best_score > NEG_INF / 2                            # (It, 1)
        lane0 = toks_ref[...].reshape(it, k, lp_)[:, 0]                # (It, Lp)
        tok_out_ref[...] = jnp.where(has_done, bdt_ref[...], lane0)

    return kernel


def fused_beam_decode(params, memory, memory_pad_mask, model_cfg, dec_cfg,
                      interpret: bool = False):
    """Whole-decode beam search. Same contract as decode.beam.beam_decode:
    memory (B, Tm, D) -> best tokens (B, max_len + 2) incl <sos>.

    ``params`` is the ORIGINAL (unpacked) param tree — packing happens here.
    Caller gates via should_use_megakernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ...models.ocr_model import init_decode_state, pack_decode_params

    b, tm, d = memory.shape
    k = dec_cfg.beam_width
    max_len = dec_cfg.max_len
    h = model_cfg.num_heads
    f = model_cfg.dec_ffn_dim
    cdt = memory.dtype
    v = model_cfg.vocab_size
    vp = 128
    w = _round_up(max_len, 8)
    lp_ = _round_up(max_len + 2, 8)
    it = 8 if not interpret else min(b, 8)
    while b % it:
        it -= 1
    bt = it * k
    nt = b // it
    n_layers = model_cfg.dec_layers

    state = init_decode_state(params, memory, memory_pad_mask, model_cfg, lanes=k,
                              cache_len=max_len)
    packed = pack_decode_params(params, fused=True)
    dec = packed["dec"]

    emb = jnp.zeros((vp, d), cdt).at[:v].set(dec["tok_emb"].astype(cdt))
    rows = min(dec["pos_emb"].shape[0], lp_)
    pos_tab = jnp.zeros((lp_, d), cdt).at[:rows].set(dec["pos_emb"][:rows].astype(cdt))
    out_w = jnp.zeros((d, vp), cdt).at[:, :v].set(dec["out"]["w"].astype(cdt))
    # padded vocab lanes are masked in-kernel; bias pad value is irrelevant
    out_b = jnp.zeros((1, vp), jnp.float32).at[0, :v].set(dec["out"]["b"].astype(jnp.float32))

    operands = [emb, pos_tab, out_w, out_b]
    in_specs = [
        pl.BlockSpec((vp, d), lambda i: (0, 0)),
        pl.BlockSpec((lp_, d), lambda i: (0, 0)),
        pl.BlockSpec((d, vp), lambda i: (0, 0)),
        pl.BlockSpec((1, vp), lambda i: (0, 0)),
    ]
    for (mk, mv) in state["mem_kv"]:
        operands += [mk.astype(cdt), mv.astype(cdt)]
        in_specs += [pl.BlockSpec((it, tm, d), lambda i: (i, 0, 0)),
                     pl.BlockSpec((it, tm, d), lambda i: (i, 0, 0))]
    operands.append(state["mem_valid_f"])
    in_specs.append(pl.BlockSpec((it, tm), lambda i: (i, 0)))

    lws = dec["layers_fused"]
    for lw in lws:
        for name in _RESIDENT_FIELDS:
            wt = lw[name].astype(cdt) if name.endswith("_w") else lw[name]
            operands.append(wt)
            zeros = tuple(0 for _ in range(wt.ndim))
            in_specs.append(pl.BlockSpec(wt.shape, lambda i, z=zeros: z))
    for lw in lws:
        for name in _STREAMED_FIELDS:
            operands.append(lw[name].astype(cdt))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    out_shape = jax.ShapeDtypeStruct((b, lp_), jnp.int32)
    out_specs = pl.BlockSpec((it, lp_), lambda i: (i, 0))

    scratch_shapes = []
    for _ in range(n_layers):
        scratch_shapes += [pltpu.VMEM((bt, w, d), cdt), pltpu.VMEM((bt, w, d), cdt)]
    scratch_shapes += [
        pltpu.VMEM((bt, lp_), jnp.int32),     # tokens
        pltpu.VMEM((bt, w), jnp.int32),       # lineage
        pltpu.VMEM((it, lp_), jnp.int32),     # best done tokens
        pltpu.VMEM((d, f), cdt),              # l1 stream buffer
        pltpu.VMEM((f, d), cdt),              # l2 stream buffer
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    kernel = _kernel_factory(it, k, n_layers, w, lp_, tm, d, h, f, vp, v, max_len,
                             dec_cfg.eos_idx, dec_cfg.sos_idx, dec_cfg.pad_idx, cdt)
    from .decode_step import VMEM_LIMIT

    toks = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    return toks[:, : max_len + 2]
