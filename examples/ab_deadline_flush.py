"""A/B the partial-bucket deadline flush on end-to-end serving (round-3
VERDICT #5): at batch 256 most chunk buckets only fill at end-of-stream, so
device decode bursts after prep finishes — RuntimeConfig.flush_deadline_ms
flushes a bucket once its oldest line ages out, overlapping prep and decode.

Runs bench.py::bench_end_to_end (768 rendered lines, beam-3) with deadline
OFF and at each given deadline, interleaved; prints lines/s medians.

    python examples/ab_deadline_flush.py [deadline_ms ...]   # default 30 60 120
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import bench_end_to_end
from khmer_ocr_tpu.config import ModelConfig
from khmer_ocr_tpu.models.ocr_model import init_model
from khmer_ocr_tpu.utils.cache import enable_compilation_cache


def main():
    deadlines = [float(a) for a in sys.argv[1:]] or [30.0, 60.0, 120.0]
    enable_compilation_cache()
    cfg = ModelConfig()
    params, stats = init_model(jax.random.PRNGKey(0), cfg)
    dtype = jnp.bfloat16
    params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    stats = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, stats)

    results: dict[float, list[float]] = {0.0: []}
    for d in deadlines:
        results[d] = []
    # interleave 3 rounds so tunnel drift hits all arms equally; round 1 also
    # absorbs the deadline arms' partial-batch-shape compiles (timing-dependent
    # shapes the fixed warmup can't anticipate — persisted via the compile cache)
    for _ in range(3):
        for d in sorted(results):
            rate = bench_end_to_end(params, stats, cfg, flush_deadline_ms=d)
            results[d].append(rate)
            print(f"deadline={d:6.1f} ms  -> {rate:7.1f} lines/s", flush=True)
    print("\n== medians over rounds ==")
    for d in sorted(results):
        med = float(np.median(results[d]))
        print(f"deadline={d:6.1f} ms  median {med:7.1f} lines/s")


if __name__ == "__main__":
    main()
