"""Fused decoder-layer decode-step Pallas kernel.

One kernel launch per decoder layer per decode step, replacing the ~12 XLA
ops/layer of the unfused path (models/layers.py::decoder_layer_step): packed
self-QKV projection, KV-cache write at ``pos``, windowed self-attention (with
optional beam parent-lineage select), residual+LN, grouped cross-attention over
the per-image memory K/V, residual+LN, and the ReLU FFN — with every
intermediate VMEM-resident. The decode step is KV-cache-bandwidth-bound
(docs/NEXT_STEPS.md round-3 item 1: ~25 XLA kernels/step, 2-3x off the
bandwidth roofline); fusing keeps the (B, D) activations on-chip so the only
HBM traffic per launch is the K/V streams plus one pass over the layer weights.

Matches the reference decoder semantics (se_model.py:162-208 via the parity-
tested XLA path): post-LN residual order, ReLU FFN, per-head softmax attention.
Attention logits/softmax accumulate in f32 (the bf16 XLA path keeps bf16
throughout — the kernel is the more accurate of the two).

Layout notes (see models/layers.py::_head_segments for the merged-head story):
  * K/V stay merged-head (…, T, D); the head partition enters as a constant
    segment mask built in-kernel, so both attention contractions are batched
    MXU matmuls streaming K/V exactly once.
  * Beam lanes are image-major rows (image i's lanes at rows i*K..i*K+K-1,
    decode/beam.py); batch tiles are image-aligned so the lineage select
    (k_read[b, t] = k_win[parent(b, t), t]) resolves within a tile as K
    exact where-selects over (It, K, w, D) views — no gathers.
  * Cross-attention reads ONE memory K/V copy per image for all K lanes.

The caches are passed through ``input_output_aliases`` and only the (B, 1, D)
slice at ``pos`` is written back — untouched slots keep their aliased input
values, so there is no full-window write-back traffic.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # matches models/layers.py
LN_EPS = 1e-5
# Every in-kernel dot pins DEFAULT precision: the caller may trace decode
# under `jax.default_matmul_precision("highest")` (the f32 parity path), and
# a HIGHEST-precision bf16 dot makes Mosaic reject the kernel ("Bad lhs type").
_PREC = jax.lax.Precision.DEFAULT

import os as _os

# Estimated-usage ceiling steering tile CHOICE. v5e scoped VMEM measures
# ~124 MB usable per kernel (examples/probe_vmem.py — the "16 MB" folk figure
# is only Mosaic's DEFAULT limit), so the budget reflects the measured tile
# optimum, not a hardware wall: the round-3 sweep put It=16 (40 MB class)
# ahead of It=8 (473 -> 448 us/step beam-3) while It=32/64 REGRESS (477/569 —
# the kernel is window-DMA-bound, not MXU-row-bound; bigger tiles just
# lengthen the per-grid-step DMA chains).
VMEM_BUDGET = int(_os.environ.get("KHMER_OCR_FUSED_VMEM", 40 * 1024 * 1024))

# Per-kernel VMEM ceiling passed to Mosaic (CompilerParams.vmem_limit_bytes).
# The DEFAULT Mosaic limit is ~16 MB and real usage can land over the
# estimate (layout assignment differs between standalone and combined
# programs — observed 16.44 MB in a packed multi-decode program for a kernel
# that fits standalone). The chip takes ~124 MB; 64 MB gives the It=16
# envelope's ~26 MB real footprint ample layout slack.
VMEM_LIMIT = int(_os.environ.get("KHMER_OCR_VMEM_LIMIT", 64 * 1024 * 1024))

# Image-tile cap on the TPU (strict) path. 16 is the measured optimum AND
# hardware-validated (beam-3 token parity vs the XLA step at B=64/128,
# Tm=128/256 on v5e); the override exists for tile experiments.
_IT_CAP = int(_os.environ.get("KHMER_OCR_FUSED_IT_CAP", 16))

# Longest memory the kernel holds RESIDENT in VMEM ((It, Tm, D) k+v blocks,
# double-buffered); beyond it the streaming online-softmax path takes over.
# With the measured ~124 MB scoped VMEM the resident envelope extends past
# the old 128 cap; the default stays at the value the tile sweep validated.
_RESIDENT_TM = int(_os.environ.get("KHMER_OCR_RESIDENT_TM", 128))

# Stage-DMA/compute overlap experiment (round-4 kernel-floor item): with "1",
# the resident path's memory K/V move from auto-pipelined input blocks to
# MANUAL DMA — the tile's own copy is issued at body entry and awaited only at
# the cross-attention stage, so the self-attention phase runs while the memory
# blocks stream instead of the whole body blocking on the full input set.
# MEASURED LOSS on v5e: 304 vs 260 us/step beam-3 (B=128, Tm=128, bf16) — the
# auto-pipeline already overlaps tile i+1's WHOLE input set with tile i's
# compute, which beats deferring one input's wait within the tile; opt-in for
# re-testing on other TPU generations only. Token-parity-covered by
# tests/test_fused_decode.py (_MEM_PREFETCH patched); measured via
# examples/profile_decode.py with the env set.
_MEM_PREFETCH = _os.environ.get("KHMER_OCR_MEM_PREFETCH") == "1"

# weight operand order (all 2D; vectors reshaped to (1, n) by the wrapper)
_WEIGHT_FIELDS = (
    "qkv_w", "qkv_b", "so_w", "so_b", "ln1_s", "ln1_b",
    "cq_w", "cq_b", "co_w", "co_b", "ln2_s", "ln2_b",
    "l1_w", "l1_b", "l2_w", "l2_b", "ln3_s", "ln3_b",
)


def layer_weights(lp) -> dict:
    """Flatten a packed decoder-layer param dict (models/layers.py::
    pack_step_params output) into the kernel's 2D weight operands."""
    r = lambda v: v[None, :] if v.ndim == 1 else v
    return {
        "qkv_w": lp["self_qkv"]["w"], "qkv_b": r(lp["self_qkv"]["b"]),
        "so_w": lp["self"]["o"]["w"], "so_b": r(lp["self"]["o"]["b"]),
        "ln1_s": r(lp["ln1"]["scale"]), "ln1_b": r(lp["ln1"]["bias"]),
        "cq_w": lp["cross"]["q"]["w"], "cq_b": r(lp["cross"]["q"]["b"]),
        "co_w": lp["cross"]["o"]["w"], "co_b": r(lp["cross"]["o"]["b"]),
        "ln2_s": r(lp["ln2"]["scale"]), "ln2_b": r(lp["ln2"]["bias"]),
        "l1_w": lp["lin1"]["w"], "l1_b": r(lp["lin1"]["b"]),
        "l2_w": lp["lin2"]["w"], "l2_b": r(lp["lin2"]["b"]),
        "ln3_s": r(lp["ln3"]["scale"]), "ln3_b": r(lp["ln3"]["bias"]),
    }


def _weight_bytes(d: int, f: int, itemsize: int) -> int:
    return itemsize * (d * 3 * d + d * d * 2 + d * f + f * d + 3 * d + f + 9 * d)


def _cross_chunk(tm: int) -> int | None:
    """Streaming cross-attention chunk size for a memory longer than the
    resident envelope: the largest divisor of tm among MXU-friendly sizes."""
    for tc in (128, 96, 64, 32):
        if tm % tc == 0:
            return tc
    return None


def _vmem_estimate(it: int, k: int, w: int, tm: int, d: int, f: int, h: int, itemsize: int,
                   vp: int = 0) -> int:
    bt = it * k
    if tm > _RESIDENT_TM:  # streaming cross: double-buffered (It, tc, D) scratch
        tc = _cross_chunk(tm) or tm
        mem_bytes = 2 * 2 * it * tc * d * itemsize  # not pipeline-doubled
        tm_live = tc
    else:
        mem_bytes = 2 * 2 * it * tm * d * itemsize  # k+v blocked, double-buffered
        tm_live = tm
    blocks = mem_bytes + 2 * (  # double-buffered in/out blocks
        bt * d * itemsize  # x
        + 2 * bt * w * d * itemsize  # self k/v window
        + it * tm * 4  # valid mask
        + bt * w * 4  # lineage
        + 3 * bt * d * itemsize  # x_out + k/v slice outs
    )
    interm = (
        2 * bt * w * d * itemsize * (1 if k > 1 else 0)  # lineage-selected k/v copies
        + bt * 3 * d * 4  # qkv f32
        + 3 * bt * w * h * 4  # self logits/softmax (approx)
        + 3 * it * tm_live * h * k * 4  # cross logits/softmax (approx, per-lane)
        + 2 * bt * f * 4  # ffn hidden
        + 2 * bt * d * 4  # residual stream
    )
    if vp:  # fused decode head: out-proj weights + double-buffered logp out + logits interm
        interm += d * vp * itemsize + vp * 4 + 2 * bt * vp * 4 + 2 * bt * vp * 4
    return _weight_bytes(d, f, itemsize) + blocks + interm


def choose_tile(n_images: int, k: int, w: int, tm: int, d: int, f: int, h: int, itemsize: int,
                strict_tiling: bool = True, vp: int = 0):
    """Largest image-tile It dividing n_images whose VMEM footprint fits.

    ``strict_tiling`` (the TPU path) requires the row tile It*K to be
    sublane-aligned (divisible by 8) — Mosaic's block-shape rule — and caps
    It at the measured optimum (16; see _IT_CAP): the round-3 v5e sweep shows
    per-step time is non-monotonic in the tile (It 8/16/32/64 -> 473/448/477/
    569 us beam-3) because the kernel is window-DMA-bound, so the gate pins
    the best VALIDATED point rather than "largest that fits" (scoped VMEM
    itself allows ~124 MB — examples/probe_vmem.py). Interpreter runs (tests)
    drop the alignment requirement so tiny shapes still exercise the
    kernel."""
    cap = _IT_CAP if strict_tiling else 32
    for it in range(min(n_images, cap), 0, -1):
        if n_images % it:
            continue
        if strict_tiling and (it * k) % 8:
            continue
        if _vmem_estimate(it, k, w, tm, d, f, h, itemsize, vp) <= VMEM_BUDGET:
            return it
    return None


def fused_step_available(b_rows: int, k: int, w: int, tm: int, d: int, f: int,
                         num_heads: int, itemsize: int, strict_tiling: bool = True) -> bool:
    if b_rows <= 0 or b_rows % k:
        return False
    if d % num_heads:
        return False
    if w % 8:
        return False  # the 8-slot-aligned cache writeback needs w % 8 == 0
    if tm > _RESIDENT_TM and _cross_chunk(tm) is None:
        return False  # streaming cross needs an MXU-friendly chunk divisor
    if strict_tiling and (w > 64 or tm > 512):
        # hardware-validated envelope on v5e: (w<=64, Tm<=_RESIDENT_TM)
        # resident cross-attention wins 3.5x vs the XLA step (264 vs 911
        # us/step beam-3 at It=16 with sort-free selection); larger Tm up to
        # 512 streams the memory K/V through a double-buffered online-softmax
        # loop. Wider windows / longer memories take the XLA step for that
        # stage/bucket.
        return False
    return choose_tile(b_rows // k, k, w, tm, d, f, num_heads, itemsize, strict_tiling) is not None


def _kernel_factory(it: int, k: int, w: int, tm: int, d: int, h: int, f: int,
                    has_lineage: bool, cdt, tc: int | None = None,
                    head: tuple[int, int] | None = None, prefetch: bool = False):
    """``tc``: streaming cross-attention chunk size — when set, mem K/V arrive
    as HBM refs and the kernel streams (It, tc, D) chunks through a manually
    double-buffered online-softmax loop (flash-decoding style) instead of
    holding (It, Tm, D) resident.

    ``head``: (vp, v_real) — fuse the decode head into this (final) layer:
    out-projection to a vp-padded vocab + masked log-softmax, emitting an
    extra (Bt, vp) f32 log-prob output (padded columns ~NEG_INF). Removes the
    remaining per-step XLA head ops (dense + log_softmax) from the beam loop
    (docs/NEXT_STEPS.md round-4 item 1).

    ``prefetch`` (resident path only, exclusive with ``tc``): memory K/V stay
    in HBM and the kernel issues their (It, Tm, D) copies itself at body
    entry, awaiting them only at the cross-attention stage — the self-
    attention phase covers the DMA and the auto-pipeline's blocking input set
    shrinks by the memory blocks (KHMER_OCR_MEM_PREFETCH experiment)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt = it * k
    hd = d // h
    f32 = jnp.float32
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    def ln(x, s_ref, b_ref):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * s_ref[...].astype(f32) + b_ref[...].astype(f32)

    def softmax1(x):  # softmax over axis 1, f32
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        return e / jnp.sum(e, axis=1, keepdims=True)

    def kernel(pos_ref, x_ref, k_cache_ref, v_cache_ref, mem_k_ref, mem_v_ref,
               mem_valid_ref, *rest):
        if has_lineage:
            lineage_ref, *wrefs = rest
        else:
            lineage_ref = None
            wrefs = rest
        # tail after the 18 layer weights: [hw, hb] (head inputs) + outs
        # (x, k, v [, logp]) + streaming/prefetch scratch (kbuf, vbuf, ksem, vsem)
        n_tail = (2 if head else 0) + 3 + (1 if head else 0) + (
            4 if (tc is not None or prefetch) else 0)
        (qkv_w, qkv_b, so_w, so_b, ln1_s, ln1_b, cq_w, cq_b, co_w, co_b,
         ln2_s, ln2_b, l1_w, l1_b, l2_w, l2_b, ln3_s, ln3_b) = wrefs[:-n_tail]
        tail = list(wrefs[len(wrefs) - n_tail:])
        if head:
            hw_ref, hb_ref = tail[:2]
            tail = tail[2:]
        x_out_ref, k_out_ref, v_out_ref = tail[:3]
        tail = tail[3:]
        if head:
            logp_ref = tail[0]
            tail = tail[1:]
        if tc is not None or prefetch:
            kbuf, vbuf, ksem, vsem = tail

        if prefetch:
            # issue THIS tile's memory K/V copies now; the self-attention
            # phase below runs while they stream (awaited at the cross stage)
            i0p = pl.program_id(0) * it
            copy_mk = pltpu.make_async_copy(mem_k_ref.at[pl.ds(i0p, it), :, :], kbuf, ksem)
            copy_mv = pltpu.make_async_copy(mem_v_ref.at[pl.ds(i0p, it), :, :], vbuf, vsem)
            copy_mk.start()
            copy_mv.start()

        pos = pos_ref[0]
        xin = x_ref[...]  # (Bt, D) cdt
        x = xin.astype(f32)

        # head-partition segment matrices (models/layers.py::_head_segments):
        # seg_dh[d, h] = 1 iff feature d belongs to head h, seg_hd its transpose.
        # Both attention contractions below run as ONE folded 2D matmul each —
        # logits = (rows, D) @ seg_dh after an elementwise q*k product — because
        # Mosaic lowers batched dot_general to per-row matmul loops that issue-
        # bind the kernel (measured 635 us/step vs XLA's 506 at B=256).
        seg_dh = (jax.lax.broadcasted_iota(jnp.int32, (d, h), 0) // hd
                  == jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)).astype(f32)
        seg_hd = (jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (h, d), 1) // hd).astype(f32)

        # ---- packed self-QKV projection + cache write ---------------------
        qkv = jnp.dot(xin, qkv_w[...], preferred_element_type=f32, precision=_PREC) + qkv_b[...].astype(f32)
        q_t = qkv[:, :d]
        k_t = qkv[:, d:2 * d].astype(cdt)
        v_t = qkv[:, 2 * d:].astype(cdt)
        # patch this position into the window as a value-level select (Mosaic
        # cannot prove a dynamic sublane store at ``pos`` aligned; a where over
        # the VMEM-resident window is effectively free)
        # NOTE: minor-dim insertion on i1 vectors is unsupported in Mosaic —
        # build every mask by reshaping the 32-bit iota BEFORE comparing
        t_iota_3 = jax.lax.broadcasted_iota(jnp.int32, (bt, w, 1), 1)
        patch = t_iota_3 == pos
        k_win = jnp.where(patch, k_t[:, None, :], k_cache_ref[...])  # (Bt, w, D)
        v_win = jnp.where(patch, v_t[:, None, :], v_cache_ref[...])
        # cache writeback rides an 8-slot-aligned block around ``pos`` (Mosaic
        # requires sublane-divisible output blocks); the other 7 slots rewrite
        # their unchanged window values
        start = pl.multiple_of((pos // 8) * 8, 8)
        t8 = start + jax.lax.broadcasted_iota(jnp.int32, (bt, 8, 1), 1)
        patch8 = t8 == pos
        k_out_ref[...] = jnp.where(patch8, k_t[:, None, :], k_cache_ref[:, pl.ds(start, 8), :])
        v_out_ref[...] = jnp.where(patch8, v_t[:, None, :], v_cache_ref[:, pl.ds(start, 8), :])

        if has_lineage:
            # image-local parent per (row, slot); slot `pos` reads self
            lin = lineage_ref[...]  # (Bt, w) int32 in [0, K)
            t_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, w), 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (bt, w), 0) % k
            lin = jnp.where(t_iota == pos, lane, lin)
            lin4 = lin.reshape(it, k, w)[..., None]  # int32 reshape, then compare
            k4 = k_win.reshape(it, k, w, d)
            v4 = v_win.reshape(it, k, w, d)
            k_read = jnp.zeros_like(k4)
            v_read = jnp.zeros_like(v4)
            for p in range(k):  # K exact where-selects; no gather
                sel = lin4 == p
                k_read = jnp.where(sel, k4[:, p:p + 1], k_read)
                v_read = jnp.where(sel, v4[:, p:p + 1], v_read)
            k_read = k_read.reshape(bt, w, d)
            v_read = v_read.reshape(bt, w, d)
        else:
            k_read, v_read = k_win, v_win

        # ---- windowed self-attention (folded merged-head matmuls) ---------
        # elementwise passes over K/V run in the cache dtype (bf16 packs 2
        # elements/lane on the VPU — these passes bound the kernel); the
        # segment-matmul reductions and softmax accumulate in f32
        seg_c = seg_dh.astype(cdt)
        segT_c = seg_hd.astype(cdt)
        prod = k_read * q_t.astype(cdt)[:, None, :]  # (Bt, w, D) cdt
        logits = jnp.dot(prod.reshape(bt * w, d), seg_c,
                         preferred_element_type=f32, precision=_PREC).reshape(bt, w, h)
        logits = logits * inv_sqrt_hd
        logits = jnp.where(t_iota_3 <= pos, logits, NEG_INF)
        attn = softmax1(logits)  # (Bt, w, H) f32
        a_exp = jnp.dot(attn.astype(cdt).reshape(bt * w, h), segT_c,
                        preferred_element_type=f32, precision=_PREC).reshape(bt, w, d).astype(cdt)
        sa = jnp.sum(a_exp * v_read, axis=1, dtype=f32)  # (Bt, D) f32
        sa = jnp.dot(sa.astype(cdt), so_w[...], preferred_element_type=f32, precision=_PREC) + so_b[...].astype(f32)
        x = ln(x + sa, ln1_s, ln1_b)

        # ---- grouped cross-attention (one memory K/V per image) -----------
        qc = jnp.dot(x.astype(cdt), cq_w[...], preferred_element_type=f32, precision=_PREC) + cq_b[...].astype(f32)
        qc3 = qc.astype(cdt).reshape(it, k, d)
        mvf = mem_valid_ref[...]  # (It, Tm) f32

        if tc is None:
            if prefetch:
                copy_mk.wait()
                copy_mv.wait()
                mem_kc = kbuf[...]  # (It, Tm, D) cdt, manually DMA'd
                mem_vc = vbuf[...]
            else:
                mem_kc = mem_k_ref[...]  # (It, Tm, D) cdt, VMEM-resident
                mem_vc = mem_v_ref[...]
            mem_ok = mvf[:, :, None] > 0  # (It, Tm, 1)
            ca_lanes = []
            for p in range(k):  # each image's memory streams once per lane (VMEM)
                cprod = mem_kc * qc3[:, p][:, None, :]  # (It, Tm, D) cdt
                cl = jnp.dot(cprod.reshape(it * tm, d), seg_c,
                             preferred_element_type=f32, precision=_PREC).reshape(it, tm, h)
                cl = jnp.where(mem_ok, cl * inv_sqrt_hd, NEG_INF)
                cattn = softmax1(cl)  # (It, Tm, H)
                ce = jnp.dot(cattn.astype(cdt).reshape(it * tm, h), segT_c,
                             preferred_element_type=f32, precision=_PREC).reshape(it, tm, d).astype(cdt)
                ca_lanes.append(jnp.sum(ce * mem_vc, axis=1, dtype=f32)[:, None, :])  # (It, 1, D)
            ca = ca_lanes[0] if k == 1 else jnp.concatenate(ca_lanes, axis=1)
            ca = ca.reshape(bt, d)
        else:
            # streaming: mem K/V live in HBM; (It, tc, D) chunks flow through
            # double-buffered DMA while an online softmax (flash-decoding
            # style) carries per-lane per-head (m, l) and merged-head o.
            i0 = pl.program_id(0) * it
            n_chunks = tm // tc

            def load(buf, sem, hbm_ref, slot, c):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(i0, it), pl.ds(c * tc, tc), :],
                    buf.at[slot], sem.at[slot])

            load(kbuf, ksem, mem_k_ref, 0, 0).start()
            load(vbuf, vsem, mem_v_ref, 0, 0).start()
            m_p = [jnp.full((it, h), NEG_INF, f32) for _ in range(k)]
            l_p = [jnp.zeros((it, h), f32) for _ in range(k)]
            o_p = [jnp.zeros((it, d), f32) for _ in range(k)]
            for c in range(n_chunks):
                slot = c % 2
                if c + 1 < n_chunks:
                    load(kbuf, ksem, mem_k_ref, (c + 1) % 2, c + 1).start()
                    load(vbuf, vsem, mem_v_ref, (c + 1) % 2, c + 1).start()
                load(kbuf, ksem, mem_k_ref, slot, c).wait()
                load(vbuf, vsem, mem_v_ref, slot, c).wait()
                k_c = kbuf[slot]  # (It, tc, D) cdt
                v_c = vbuf[slot]
                ok_c = mvf[:, c * tc:(c + 1) * tc][:, :, None] > 0  # (It, tc, 1)
                for p in range(k):
                    cprod = k_c * qc3[:, p][:, None, :]
                    cl = jnp.dot(cprod.reshape(it * tc, d), seg_c,
                                 preferred_element_type=f32, precision=_PREC).reshape(it, tc, h)
                    cl = jnp.where(ok_c, cl * inv_sqrt_hd, NEG_INF)
                    m_new = jnp.maximum(m_p[p], jnp.max(cl, axis=1))  # (It, H)
                    corr = jnp.exp(m_p[p] - m_new)
                    e = jnp.where(ok_c, jnp.exp(cl - m_new[:, None, :]), 0.0)
                    l_p[p] = l_p[p] * corr + jnp.sum(e, axis=1)
                    ce = jnp.dot(e.astype(cdt).reshape(it * tc, h), segT_c,
                                 preferred_element_type=f32, precision=_PREC)
                    ce = ce.reshape(it, tc, d).astype(cdt)
                    contrib = jnp.sum(ce * v_c, axis=1, dtype=f32)  # (It, D)
                    corr_d = jnp.dot(corr, seg_hd, preferred_element_type=f32,
                                     precision=_PREC)  # (It, D)
                    o_p[p] = o_p[p] * corr_d + contrib
                    m_p[p] = m_new
            ca_lanes = []
            for p in range(k):
                l_d = jnp.dot(l_p[p], seg_hd, preferred_element_type=f32, precision=_PREC)
                ca_lanes.append((o_p[p] / l_d)[:, None, :])
            ca = ca_lanes[0] if k == 1 else jnp.concatenate(ca_lanes, axis=1)
            ca = ca.reshape(bt, d)
        ca = jnp.dot(ca.astype(cdt), co_w[...], preferred_element_type=f32, precision=_PREC) + co_b[...].astype(f32)
        x = ln(x + ca, ln2_s, ln2_b)

        # ---- ReLU FFN ------------------------------------------------------
        h1 = jnp.dot(x.astype(cdt), l1_w[...], preferred_element_type=f32, precision=_PREC) + l1_b[...].astype(f32)
        h1 = jnp.maximum(h1, 0.0)
        h2 = jnp.dot(h1.astype(cdt), l2_w[...], preferred_element_type=f32, precision=_PREC) + l2_b[...].astype(f32)
        x = ln(x + h2, ln3_s, ln3_b)
        x_out_ref[...] = x.astype(x_out_ref.dtype)

        if head:
            # ---- fused decode head: out-proj + masked log-softmax ----------
            # Mirror the XLA head's rounding (beam.py: bf16 dense -> f32
            # log_softmax): round the f32-accumulated matmul to the compute
            # dtype and add the bias there before widening, so bf16 serving
            # cannot diverge from the XLA path on near-tie tokens (ADVICE r3
            # #2). In f32 serving the casts are identity.
            vp, v_real = head
            lg = jnp.dot(x.astype(cdt), hw_ref[...], preferred_element_type=f32,
                         precision=_PREC).astype(cdt)
            lg = (lg + hb_ref[...].astype(cdt)).astype(f32)  # (Bt, Vp)
            colv = jax.lax.broadcasted_iota(jnp.int32, (bt, vp), 1)
            lg = jnp.where(colv < v_real, lg, NEG_INF)
            m = jnp.max(lg, axis=1, keepdims=True)
            lse = jnp.log(jnp.sum(jnp.exp(lg - m), axis=1, keepdims=True)) + m
            logp_ref[...] = lg - lse

    return kernel


def should_use_fused(b_rows: int, lanes: int, max_window: int, tm: int, d: int, f: int,
                     num_heads: int, itemsize: int, mode: str | None = None) -> tuple[bool, bool]:
    """Trace-time policy: (use_fused, interpret).

    Fused decode is on by default on TPU when the shapes fit the VMEM tiling;
    ``mode`` "0" disables it, "1" forces it on other backends through the
    Pallas interpreter (tests). ``mode=None`` reads KHMER_OCR_FUSED_DECODE at
    TRACE time — jit callers should instead snapshot the env var into
    ``DecodeConfig.fused_mode`` (a static jit arg) so toggling it between
    calls is not silently ignored by a warm jit cache (the Predictor does)."""
    import os

    env = os.environ.get("KHMER_OCR_FUSED_DECODE") if mode is None else mode
    if env == "0":
        return False, False
    backend = jax.default_backend()
    if backend != "tpu" and env != "1":
        return False, False
    if lanes == 1 and env != "1":
        # measured on v5e (B=256, Tm=128, 64 steps): XLA greedy decode is
        # already near its HBM roofline (202 us/step) and the kernel's small
        # row tiles lose to it (297 us/step); beam is where fusion wins
        # (839 vs 1116 us/step at 384 lanes) — in-kernel lineage select +
        # grouped cross-attention beat XLA's gather. Auto mode fuses beam only.
        return False, False
    strict = backend == "tpu"
    ok = fused_step_available(b_rows, lanes, max_window, tm, d, f, num_heads, itemsize,
                              strict_tiling=strict)
    return ok, not strict


def head_fusion_compatible(b_rows: int, k: int, w: int, tm: int, d: int, f: int,
                           num_heads: int, itemsize: int, vocab_size: int,
                           strict_tiling: bool = True) -> bool:
    """True iff fusing the decode head into the last layer's kernel is safe for
    this stage: the head-augmented VMEM estimate (vp > 0) must admit the SAME
    tile as the headless estimate. ``fused_step_available`` gates with vp=0;
    without this check a VMEM-tight shape can pass the gate and then trip the
    trace-time assert in fused_decoder_layer_step when choose_tile re-runs with
    the head's vp — or silently pick a smaller tile for the last layer than the
    other layers run at (ADVICE r3 #1). Callers fall back to the XLA head when
    this returns False."""
    vp = -(-vocab_size // 128) * 128
    n_images = b_rows // k
    it0 = choose_tile(n_images, k, w, tm, d, f, num_heads, itemsize, strict_tiling)
    itv = choose_tile(n_images, k, w, tm, d, f, num_heads, itemsize, strict_tiling, vp=vp)
    return it0 is not None and itv == it0


def fused_decoder_layer_step(weights, x, pos, self_k, self_v, mem_k, mem_v, mem_valid_f,
                             lineage=None, *, num_heads: int, window: int, lanes: int = 1,
                             interpret: bool = False, head=None):
    """One fused decoder-layer decode step.

    weights: dict from `layer_weights`. x: (B, D) layer input at position
    ``pos``. self_k/self_v: (B, L, D) merged-head caches (L >= window) —
    returned updated at ``pos``. mem_k/mem_v: (B/lanes, Tm, D) per-image
    memory projections; mem_valid_f: (B/lanes, Tm) float 1/0 validity.
    lineage: (B, window) int32 image-local beam parents (None for greedy).
    ``head``: (out_w (D, Vp) in x.dtype, out_b (1, Vp) f32, v_real) — fuse the
    decode head (out-proj + masked log-softmax over the first v_real columns)
    into this final-layer kernel. Returns (x_out, self_k, self_v) — plus
    logp (B, Vp) f32 when ``head`` is given.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = x.shape
    k = lanes
    bi, tm, _ = mem_k.shape
    assert bi * k == b, (bi, k, b)
    w = min(window, self_k.shape[1])
    assert w % 8 == 0, w
    f = weights["l1_w"].shape[1]
    vp = head[0].shape[1] if head is not None else 0
    it = choose_tile(bi, k, w, tm, d, f, num_heads, x.dtype.itemsize, strict_tiling=not interpret,
                     vp=vp)
    assert it is not None, "caller must gate on fused_step_available"
    bt = it * k
    nt = bi // it
    has_lineage = lineage is not None

    cdt = x.dtype
    grid = (nt,)
    tc = _cross_chunk(tm) if tm > _RESIDENT_TM else None  # streaming cross beyond the resident envelope
    prefetch = _MEM_PREFETCH and tc is None

    if tc is None and not prefetch:
        mem_specs = [
            pl.BlockSpec((it, tm, d), lambda i, sp: (i, 0, 0)),
            pl.BlockSpec((it, tm, d), lambda i, sp: (i, 0, 0)),
        ]
    else:
        # streaming/prefetch: K/V stay in HBM; the kernel DMAs them itself
        mem_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    in_specs = [
        pl.BlockSpec((bt, d), lambda i, sp: (i, 0)),
        pl.BlockSpec((bt, w, d), lambda i, sp: (i, 0, 0)),
        pl.BlockSpec((bt, w, d), lambda i, sp: (i, 0, 0)),
        *mem_specs,
        pl.BlockSpec((it, tm), lambda i, sp: (i, 0)),
    ]
    operands = [x, self_k, self_v, mem_k, mem_v, mem_valid_f]
    if has_lineage:
        in_specs.append(pl.BlockSpec((bt, w), lambda i, sp: (i, 0)))
        operands.append(lineage)
    for name in _WEIGHT_FIELDS:
        wt = weights[name]
        zeros = tuple(0 for _ in range(wt.ndim))
        in_specs.append(pl.BlockSpec(wt.shape, lambda i, sp, z=zeros: z))
        operands.append(wt)
    if head is not None:
        hw, hb, v_real = head
        assert hw.dtype == cdt, (hw.dtype, cdt)
        in_specs.append(pl.BlockSpec(hw.shape, lambda i, sp: (0, 0)))
        in_specs.append(pl.BlockSpec(hb.shape, lambda i, sp: (0, 0)))
        operands += [hw, hb]

    out_specs = [
        pl.BlockSpec((bt, d), lambda i, sp: (i, 0)),
        pl.BlockSpec((bt, 8, d), lambda i, sp: (i, sp[0] // 8, 0)),
        pl.BlockSpec((bt, 8, d), lambda i, sp: (i, sp[0] // 8, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), cdt),
        jax.ShapeDtypeStruct(self_k.shape, self_k.dtype),
        jax.ShapeDtypeStruct(self_v.shape, self_v.dtype),
    ]
    if head is not None:
        out_specs.append(pl.BlockSpec((bt, vp), lambda i, sp: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, vp), jnp.float32))

    scratch_shapes = []
    if tc is not None:
        scratch_shapes = [
            pltpu.VMEM((2, it, tc, d), cdt),
            pltpu.VMEM((2, it, tc, d), cdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif prefetch:
        scratch_shapes = [
            pltpu.VMEM((it, tm, d), cdt),
            pltpu.VMEM((it, tm, d), cdt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    kernel = _kernel_factory(it, k, w, tm, d, num_heads, f, has_lineage, cdt, tc=tc,
                             head=(vp, v_real) if head is not None else None,
                             prefetch=prefetch)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # operand indices count the scalar-prefetch arg: pos=0, x=1, self_k=2, self_v=3
        input_output_aliases={2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(pos_arr, *operands)
    if head is not None:
        x_out, new_k, new_v, logp = outs
        return x_out, new_k, new_v, logp
    x_out, new_k, new_v = outs
    return x_out, new_k, new_v
