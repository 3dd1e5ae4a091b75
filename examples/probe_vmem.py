"""Probe the real per-kernel scoped-VMEM ceiling on this TPU.

Mosaic's DEFAULT vmem limit is ~16 MB, but the hardware may allow more via
CompilerParams(vmem_limit_bytes=...) — round 3 validated 24 MB on this v5e.
This script bisects the largest VMEM scratch a trivial kernel can allocate,
which bounds how big the fused decode-step tile (ops/pallas/decode_step.py)
can grow. Run alone (one TPU client at a time).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_mb(mb: float) -> bool:
    rows = int(mb * 1024 * 1024 / (128 * 4))  # f32 (rows, 128) scratch

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        scratch[rows - 1, :] = x_ref[0, :] * 2.0
        o_ref[0, :] = scratch[0, :] + scratch[rows - 1, :]

    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int((mb + 4) * 1024 * 1024)
            ),
        )(x)
        np.asarray(out)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"  {mb:.0f} MB failed: {msg}", flush=True)
        return False


def main():
    print(f"devices: {jax.devices()}", flush=True)
    lo, hi = 8.0, 160.0
    # coarse ladder first
    for mb in (16, 24, 32, 48, 64, 96, 128):
        ok = try_mb(float(mb))
        print(f"scratch {mb} MB: {'OK' if ok else 'FAIL'}", flush=True)
        if ok:
            lo = float(mb)
        else:
            hi = float(mb)
            break
    # bisect to ~4 MB
    while hi - lo > 4:
        mid = (lo + hi) / 2
        if try_mb(mid):
            lo = mid
        else:
            hi = mid
    print(f"max scoped-VMEM scratch ~= {lo:.0f} MB (fails at {hi:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
