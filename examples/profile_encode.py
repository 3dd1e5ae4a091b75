"""Per-stage encode profiling on TPU: where does the CNN+encoder time go?

Times each backbone stage (conv blocks, SE, pools, adaptive pool, patch,
encoder layers, BiLSTM) as separately jitted scalar-reduced programs, plus the
fused whole-encode, at a few batch sizes. Informs the encode-MXU work
(round-1 VERDICT weak #3 / next-step #7).

Usage: python examples/profile_encode.py [--batch 512]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root (run directly from anywhere)

import argparse
import time

import numpy as np


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp

    outs = [fn(*args) for _ in range(2)]
    [np.asarray(o) for o in outs]
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    [np.asarray(o) for o in outs]
    return (time.perf_counter() - t0) / iters * 1000


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512, help="chunks per batch")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import ModelConfig
    from khmer_ocr_tpu.models import backbones
    from khmer_ocr_tpu.models.layers import Ctx, encoder_layer
    from khmer_ocr_tpu.models.ocr_model import encode, init_model, patch_apply
    from khmer_ocr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, stats = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    ctx = Ctx(num_heads=cfg.num_heads, dropout=0.0, deterministic=True)

    b = args.batch
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (b, 48, 100, 1)).astype(np.float32), dtype=dtype)

    bp, bs = params["backbone"], stats

    # --- stage-by-stage (SE-VGG) --------------------------------------------
    stages = []

    def stage(name, fn, xin):
        f = jax.jit(lambda *a: fn(*a).sum())
        ms = timeit(f, xin)
        full = jax.jit(fn)
        xout = full(xin)
        stages.append((name, ms, tuple(xout.shape)))
        return xout

    x = x0
    from khmer_ocr_tpu.models.backbones import (adaptive_avg_pool2d, batch_norm, conv2d, max_pool,
                                                se_block)

    def cbr(name):
        def f(xx):
            y = conv2d(bp[name], xx)
            y, _ = batch_norm(bp[f"bn_{name}"], bs[f"bn_{name}"], y, False)
            return jax.nn.relu(y)

        return f

    x = stage("conv1+bn+relu (1->64 @48x100)", cbr("conv1"), x)
    x = stage("pool1", lambda xx: max_pool(xx, (2, 2), (2, 2)), x)
    x = stage("conv2 (64->128 @24x50)", cbr("conv2"), x)
    x = stage("pool2", lambda xx: max_pool(xx, (2, 2), (2, 2)), x)
    x = stage("conv3 (128->256 @12x25)", cbr("conv3"), x)
    x = stage("conv4 (256->256)", cbr("conv4"), x)
    x = stage("se3", lambda xx: se_block(bp["se3"], xx), x)
    x = stage("pool3 (2,1)", lambda xx: max_pool(xx, (2, 1), (2, 1)), x)
    x = stage("conv5 (256->512 @6x25)", cbr("conv5"), x)
    x = stage("conv6 (512->512)", cbr("conv6"), x)
    x = stage("se4", lambda xx: se_block(bp["se4"], xx), x)
    x = stage("pool4 (2,1)", lambda xx: max_pool(xx, (2, 1), (2, 1)), x)
    x = stage("conv7 (512->512 @3x25)", cbr("conv7"), x)
    x = stage("se5", lambda xx: se_block(bp["se5"], xx), x)
    x = stage("adaptive_pool (2,32)", lambda xx: adaptive_avg_pool2d(xx, (2, 32)), x)
    x = stage("patch (1024->384)", lambda xx: patch_apply(params["patch"], xx), x)
    for i in range(cfg.enc_layers):
        x = stage(f"enc_layer{i}", lambda xx, i=i: encoder_layer(params["enc"][i], ctx, xx), x)

    total_stage = sum(ms for _, ms, _ in stages)
    print(f"\nbatch={b} chunks, dtype={args.dtype}")
    for name, ms, shape in stages:
        print(f"  {name:36s} {ms:8.3f} ms  -> {shape}")
    print(f"  {'SUM of stages':36s} {total_stage:8.3f} ms")

    # --- fused whole-encode (what production runs) ---------------------------
    n_chunks = 4
    chunks = jnp.asarray(
        rng.uniform(-1, 1, (b // n_chunks, n_chunks, 48, 100)).astype(np.float32), dtype=dtype
    )
    counts = jnp.full((b // n_chunks,), n_chunks, jnp.int32)

    @jax.jit
    def enc_full(ch, ct):
        mem, mask, _ = encode(params, stats, ch, ct, cfg, ctx, train=False)
        return mem.sum()

    ms = timeit(enc_full, chunks, counts)
    lines = b // n_chunks
    print(f"  {'FUSED encode (incl. BiLSTM)':36s} {ms:8.3f} ms  ({lines / ms * 1000:.0f} lines/s)")


if __name__ == "__main__":
    main()
