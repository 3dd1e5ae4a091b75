"""Benchmark: batched text-line recognition throughput (encode + greedy decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md) — its decode loop is
per-image Python with no KV cache. The driver-set north star is >= 5000
text-line images/sec on a v5e-8; this bench runs on however many chips are
visible and compares against the pro-rated per-chip share (5000/8 per chip).

Workload: realistic text lines (4-chunk bucket = lines ~436 px wide at H=48),
SE-VGG+BiLSTM flagship, greedy decode to 64 tokens (typical line length ~40-60
chars), batch 128 per chip. Weights are random (decode length is forced to the
full 64 steps by disabling early exit via an all-finite argmax path — random
weights rarely emit <eos>, and the while_loop cost is per-step identical to
trained weights).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import DecodeConfig, ModelConfig
    from khmer_ocr_tpu.infer.predictor import _infer_jit
    from khmer_ocr_tpu.models.ocr_model import init_model

    n_dev = len(jax.devices())
    cfg = ModelConfig()
    params, stats = init_model(jax.random.PRNGKey(0), cfg)
    dtype = jnp.bfloat16
    params_c = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    batch, n_chunks, steps = 256, 4, 64
    rng = np.random.RandomState(0)
    chunks = jnp.asarray(rng.uniform(-1, 1, (batch, n_chunks, 48, 100)).astype(np.float32), dtype=dtype)
    counts = jnp.full((batch,), n_chunks, jnp.int32)
    dec_cfg = DecodeConfig(beam_width=1, max_len=steps)

    def run():
        return _infer_jit(params_c, stats, chunks, counts, cfg, dec_cfg, False, "default")

    _ = np.asarray(run())  # compile + warm

    # NOTE: on the axon remote client, block_until_ready() returns at dispatch,
    # not completion — only a device->host fetch truly synchronizes. Enqueue all
    # iterations (pipelined, as a serving system would) and drain every result.
    n_iters = 10
    t0 = time.perf_counter()
    outs = [run() for _ in range(n_iters)]
    for o in outs:
        np.asarray(o)
    dt = time.perf_counter() - t0

    lines_per_sec = batch * n_iters / dt
    per_chip_target = 5000.0 / 8.0  # north-star v5e-8 target pro-rated per chip
    vs_baseline = lines_per_sec / (per_chip_target * n_dev)
    print(json.dumps({
        "metric": "textline_ocr_throughput",
        "value": round(lines_per_sec, 2),
        "unit": "lines/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
