"""A/B: Pallas-kernel BiLSTM vs `lax.scan` inside the TRAINING step (VERDICT r4 #7).

The Pallas LSTM recurrence (ops/pallas/lstm.py) ships a custom_vjp — kernel
forward, reverse-scan adjoint backward — so training CAN take it. Whether it
SHOULD is a measurement: the kernel keeps weights VMEM-resident and
double-buffers gate DMA (an inference win at large serving batches), but the
training step differentiates through it, and the adjoint is a plain scan
either way. This times the full reference-recipe train step (bench.py::
bench_train — Adam, masked CE, fori_loop-carried TrainState so the slope is
pure device time) in two subprocesses (separate processes so the
KHMER_OCR_PALLAS_LSTM_TRAIN trace-time env var can't be stale in a warm jit
cache), at the recipe batch (32) and a large-batch point (128).

Result decides the default in models/ocr_model.py::encode. Writes
docs/artifacts/ab_pallas_lstm_train.json.

    python examples/ab_pallas_lstm_train.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
from khmer_ocr_tpu.config import ModelConfig
from khmer_ocr_tpu.utils.cache import enable_compilation_cache
import bench
enable_compilation_cache()
cfg = ModelConfig()
rows = {{}}
for bs, n_chunks in ((32, 4), (128, 4)):
    rows[f"b{{bs}}"] = bench.bench_train(cfg, batch_size=bs, n_chunks=n_chunks)
print("RESULT " + json.dumps(rows))
"""


def run_variant(flag: str) -> dict:
    env = dict(os.environ, KHMER_OCR_PALLAS_LSTM_TRAIN=flag)
    out = subprocess.run([sys.executable, "-c", CHILD.format(repo=str(REPO))],
                         cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"variant {flag} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    scan = run_variant("0")
    print(f"scan path: {scan}", flush=True)
    pallas = run_variant("1")
    print(f"pallas path: {pallas}", flush=True)
    report = {"train_lines_per_sec": {"scan": scan, "pallas": pallas}}
    report["winner"] = {
        k: ("pallas" if pallas[k] > scan[k] else "scan") for k in scan
    }
    out = REPO / "docs" / "artifacts" / "ab_pallas_lstm_train.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
