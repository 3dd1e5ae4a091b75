"""Re-derive the fused-decode envelope on the CURRENT TPU generation.

The defaults baked into ops/pallas/decode_step.py (It cap 16, 40 MB tile
budget, 64 MB Mosaic limit, fused-beam/XLA-greedy policy) are the v5e-8
MEASURED optimum (docs/NEXT_STEPS.md round-3 findings) — they are performance
choices, not hardware walls, and nothing re-validates them off v5e. This
script reruns the deriving experiments on whatever TPU it finds and emits the
recommended env block:

    python examples/autotune_decode.py                 # beam-3 sweep (default)
    python examples/autotune_decode.py --greedy        # + greedy fused-vs-XLA
    python examples/autotune_decode.py --out tune.json

For each candidate image tile It (8/16/32/64, Mosaic-aligned, VMEM-feasible)
it measures beam-3 device us/step with the slope method — R decodes inside one
jitted `fori_loop`, slope between two R values — which is immune to the
~25-30 ms per-call dispatch cost that wall-clock timing would measure instead.
The XLA step path is the baseline; if it wins, the recommendation is
KHMER_OCR_FUSED_DECODE=0. Token parity fused-vs-XLA is asserted at the winning
tile before anything is recommended.

VMEM probing (examples/probe_vmem.py) is deliberately NOT run here: driving
VMEM-overflow failures can wedge the device state for subsequent programs
(the leading suspect for round 3's driver-bench FailedPrecondition). The tile
budget is derived analytically from _vmem_estimate at each candidate instead.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
from khmer_ocr_tpu.decode import beam_decode, greedy_decode
from khmer_ocr_tpu.models.ocr_model import init_model
from khmer_ocr_tpu.ops.pallas import decode_step as ds
from khmer_ocr_tpu.utils.cache import enable_compilation_cache

STEPS = 64
R_LO, R_HI = 2, 10
D, F, H, ISZ = 384, 1536, 8, 2  # flagship geometry, bf16
CHIP_VMEM_CAP = 120 * 1024 * 1024  # stay under the ~124 MB scoped ceiling


def _slope_us_per_step(decode, cfg, dc, params, mem, pad) -> float:
    """Per-step device time via the loop-carried slope method."""
    times = {}
    for rep in (R_LO, R_HI):
        def fn(p, m, pd, _rep=rep):
            def body(i, acc):
                t = decode(p, m, pd, cfg, dc)
                # consume a data-dependent element so the body can't be hoisted
                return acc + t[(i % t.shape[0]).astype(jnp.int32), -1].astype(jnp.int32)

            return jax.lax.fori_loop(0, _rep, body, jnp.int32(0))

        jfn = jax.jit(fn)
        np.asarray(jfn(params, mem, pad))  # compile + warm
        times[rep] = min(_timed(jfn, params, mem, pad) for _ in range(3))
    per_decode = (times[R_HI] - times[R_LO]) / (R_HI - R_LO)
    return per_decode / STEPS * 1e6


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def _patch(monkey: dict):
    """Set decode_step module globals (the env-var mirrors) for one trace."""
    prev = {k: getattr(ds, k) for k in monkey}
    for k, v in monkey.items():
        setattr(ds, k, v)
    return prev


def sweep_beam(params, cfg, b: int, tm: int, out: dict) -> None:
    dc = DecodeConfig(beam_width=3, max_len=STEPS, fused_mode="0")
    r = np.random.RandomState(0)
    mem = jnp.asarray(r.randn(b, tm, D).astype(np.float32) * 0.5, dtype=jnp.bfloat16)
    pad = jnp.zeros((b, tm), bool)

    xla_us = _slope_us_per_step(beam_decode, cfg, dc, params, mem, pad)
    out["beam3_xla_us_per_step"] = round(xla_us, 1)
    print(f"beam3 XLA step: {xla_us:.0f} us/step", flush=True)

    results: dict[int, float] = {}
    dc_f = DecodeConfig(beam_width=3, max_len=STEPS, fused_mode="1")
    w = 64  # the decode window stage the bench shapes exercise
    for it in (8, 16, 32, 64):
        if b % it or (it * 3) % 8:
            continue
        est = ds._vmem_estimate(it, 3, w, tm, D, F, H, ISZ)
        if est > CHIP_VMEM_CAP:
            print(f"beam3 fused It={it}: skipped (estimate {est >> 20} MB > cap)", flush=True)
            continue
        prev = _patch({
            "_IT_CAP": it,
            "VMEM_BUDGET": est + 1,
            "VMEM_LIMIT": min(CHIP_VMEM_CAP, max(ds.VMEM_LIMIT, est + (16 << 20))),
        })
        try:
            us = _slope_us_per_step(beam_decode, cfg, dc_f, params, mem, pad)
            results[it] = round(us, 1)
            print(f"beam3 fused It={it} (~{est >> 20} MB): {us:.0f} us/step", flush=True)
        finally:
            _patch(prev)
    out["beam3_fused_us_per_step_by_it"] = results

    if results and min(results.values()) < xla_us:
        best_it = min(results, key=results.get)
        est = ds._vmem_estimate(best_it, 3, w, tm, D, F, H, ISZ)
        prev = _patch({
            "_IT_CAP": best_it,
            "VMEM_BUDGET": est + 1,
            "VMEM_LIMIT": min(CHIP_VMEM_CAP, max(ds.VMEM_LIMIT, est + (16 << 20))),
        })
        try:
            ref = np.asarray(jax.jit(
                lambda p, m, pd: beam_decode(p, m, pd, cfg, dc))(params, mem, pad))
            got = np.asarray(jax.jit(
                lambda p, m, pd: beam_decode(p, m, pd, cfg, dc_f))(params, mem, pad))
        finally:
            _patch(prev)
        assert (ref == got).all(), f"token parity FAILED at winning tile It={best_it}"
        out["recommend"] = {
            "KHMER_OCR_FUSED_IT_CAP": best_it,
            "KHMER_OCR_FUSED_VMEM": est + 1,
            "KHMER_OCR_VMEM_LIMIT": int(min(CHIP_VMEM_CAP,
                                            max(ds.VMEM_LIMIT, est + (16 << 20)))),
            "beam3_us_per_step": results[best_it],
            "speedup_vs_xla": round(xla_us / results[best_it], 2),
            "token_parity": True,
        }
        print(f"-> fused wins at It={best_it}: {results[best_it]} vs XLA {xla_us:.0f} "
              f"us/step ({xla_us / results[best_it]:.2f}x), token parity OK", flush=True)
    else:
        out["recommend"] = {"KHMER_OCR_FUSED_DECODE": "0"}
        print("-> XLA step wins on this generation; recommend KHMER_OCR_FUSED_DECODE=0",
              flush=True)


def sweep_greedy(params, cfg, b: int, tm: int, out: dict) -> None:
    r = np.random.RandomState(1)
    mem = jnp.asarray(r.randn(b, tm, D).astype(np.float32) * 0.5, dtype=jnp.bfloat16)
    pad = jnp.zeros((b, tm), bool)
    res = {}
    for mode in ("0", "1"):
        dc = DecodeConfig(beam_width=1, max_len=STEPS, fused_mode=mode)
        res[mode] = round(_slope_us_per_step(greedy_decode, cfg, dc, params, mem, pad), 1)
        print(f"greedy fused={mode}: {res[mode]:.0f} us/step", flush=True)
    out["greedy_us_per_step"] = {"xla": res["0"], "fused": res["1"]}
    out["greedy_fused_wins"] = res["1"] < res["0"]  # v5e: False (202 vs 346)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--b", type=int, default=128, help="images (beam) / lanes (greedy)")
    p.add_argument("--tm", type=int, default=128, help="memory length")
    p.add_argument("--greedy", action="store_true", help="also A/B greedy fused-vs-XLA")
    p.add_argument("--out", default=None, help="write the result JSON here")
    args = p.parse_args()

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    cfg = ModelConfig()
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, params)

    out: dict = {"device_kind": str(getattr(dev, "device_kind", dev.platform)),
                 "b": args.b, "tm": args.tm, "steps": STEPS}
    sweep_beam(params, cfg, args.b, args.tm, out)
    if args.greedy:
        sweep_greedy(params, cfg, args.b * 3, args.tm, out)
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2), encoding="utf-8")


if __name__ == "__main__":
    main()
