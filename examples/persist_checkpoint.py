"""Persist a trained checkpoint INSIDE the repo (bf16, inference-only).

Round-4 VERDICT #3: no trained checkpoint survived between rounds — the
100-epoch run's Orbax state lived in a scratch dir that the environment wipes,
so every real-weight claim (early-exit depth, beam-vs-greedy CER, decode
throughput) had to be re-derived from a fresh multi-hour run. The reference
ships its weights (`.MISSING_LARGE_BLOBS:3-5` — stripped in this mirror, which
is exactly why first-party weights must be checked in).

This strips a full training checkpoint (params + BN + opt_state + step,
train/checkpoint.py) down to the serving payload: params cast to bf16
(~2 bytes/param; serving casts to bf16 anyway — infer/predictor.py), BN stats
kept f32 (tiny), optimizer state dropped. The result loads through the normal
``Predictor(model_path=<dir>)`` path.

    python examples/persist_checkpoint.py --ckpt /root/r5_train_se_vgg/ckpts/epoch030 \
        --out checkpoints/se_vgg_flagship
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from khmer_ocr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

REPO = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO / "checkpoints" / "se_vgg_flagship"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, help="Training Orbax checkpoint dir")
    p.add_argument("--out", default=str(DEFAULT_OUT))
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = p.parse_args()

    params, stats, mcfg = load_checkpoint(args.ckpt)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = jax.tree.map(
        lambda v: np.asarray(v, dtype) if np.asarray(v).dtype == np.float32 else np.asarray(v),
        params,
    )
    out = save_checkpoint(args.out, params, stats, mcfg)
    n_bytes = sum(np.asarray(v).nbytes for v in jax.tree.leaves(params))
    n_params = sum(np.asarray(v).size for v in jax.tree.leaves(params))
    print(f"persisted {n_params/1e6:.1f}M params ({n_bytes/1e6:.1f} MB {args.dtype}) -> {out}")

    # round-trip sanity through the serving loader
    p2, s2, cfg2 = load_checkpoint(out)
    assert cfg2 == mcfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("round-trip load OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
