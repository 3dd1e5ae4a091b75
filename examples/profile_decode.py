"""Decode device-time profiler: greedy/beam steps, fused vs XLA, slope method.

Host dispatch on the axon-tunneled runtime costs ~25-30 ms per program call,
so wall-clocking sequential decodes measures dispatch, not the device. Here R
decodes run inside ONE jitted `fori_loop` and the slope between two R values
isolates per-decode device time (docs/NEXT_STEPS.md "Corrections" section).

Usage:
    python examples/profile_decode.py greedy          # fused off vs on
    python examples/profile_decode.py beam 0,1        # XLA then fused
    python examples/profile_decode.py beam8 1         # Tm=256 streaming only

Measured v5e-1 (bf16, 64 steps): greedy B=256 202 us/step (XLA; fused loses
there and auto-stays off); beam-3 384 lanes Tm=128 1116 -> 487 us/step fused;
Tm=256 1155 -> 625 us/step (streaming cross-attention).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root (run from anywhere)

import numpy as np
import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
from khmer_ocr_tpu.decode import beam_decode, greedy_decode
from khmer_ocr_tpu.models.ocr_model import init_model
from khmer_ocr_tpu.utils.cache import enable_compilation_cache

STEPS = 64
R_LO, R_HI = 2, 10
CONFIGS = {"greedy": (1, 256, 128), "beam": (3, 128, 128), "beam8": (3, 128, 256)}


def make_fn(decode, cfg, dc, repeats):
    def fn(p, mem, pad):
        def body(i, acc):
            t = decode(p, mem, pad, cfg, dc)
            # consume a data-dependent element so the body cannot be hoisted
            return acc + t[(i % t.shape[0]).astype(jnp.int32), -1].astype(jnp.int32)

        return jax.lax.fori_loop(0, repeats, body, jnp.int32(0))

    return jax.jit(fn)


def run(cfg, params, mode, beam, b, tm):
    os.environ["KHMER_OCR_FUSED_DECODE"] = mode
    dc = DecodeConfig(beam_width=beam, max_len=STEPS)
    r = np.random.RandomState(0)
    mem = jnp.asarray(r.randn(b, tm, 384).astype(np.float32) * 0.5, dtype=jnp.bfloat16)
    pad = jnp.zeros((b, tm), bool)
    decode = beam_decode if beam > 1 else greedy_decode
    times = {}
    for rep in (R_LO, R_HI):
        fn = make_fn(decode, cfg, dc, rep)
        t0 = time.perf_counter()
        np.asarray(fn(params, mem, pad))
        compile_s = time.perf_counter() - t0
        best = min(
            _timed(fn, params, mem, pad) for _ in range(3)
        )
        times[rep] = best
        print(f"  rep={rep}: {best*1e3:.1f} ms (compile {compile_s:.0f}s)", flush=True)
    per_decode = (times[R_HI] - times[R_LO]) / (R_HI - R_LO)
    label = f"{'beam' + str(beam) if beam > 1 else 'greedy'} B={b} Tm={tm} fused={mode or 'auto'}"
    print(f"{label}: {per_decode*1e3:.2f} ms/decode  ({per_decode/STEPS*1e6:.0f} us/step)  "
          f"{b/per_decode:.0f} lines/s(device)", flush=True)


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig()
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, params
    )
    which = sys.argv[1] if len(sys.argv) > 1 else "beam"
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["0", "1"]
    beam, b, tm = CONFIGS[which]
    for mode in modes:
        run(cfg, params, mode, beam, b, tm)


if __name__ == "__main__":
    main()
