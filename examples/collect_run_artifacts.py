"""Publish reference-scale run artifacts into the repo (round-2 VERDICT weak #2).

Collects from a train_reference_scale.py workdir:
  * ``epoch_metrics.jsonl`` — deduplicated (a killed-and-resumed run re-appends
    the epochs it replays from the restored checkpoint; keep the LAST record
    per epoch, which is the one the surviving weights actually trained through)
  * ``eval_results.json`` — held-out CER/exact-match at beam 1/3, both splits
  * ``train.log`` excerpts — start/resume lines, every Nth progress line, all
    eye tests, checkpoint saves (full logs are hundreds of MB of batch lines)

and writes them to ``docs/artifacts/`` plus a markdown summary table appended
to ``docs/REF_SCALE_RUN.md``.

Usage: python examples/collect_run_artifacts.py [--workdir /root/ref_scale_run]
       [--log /root/ref_train.log] [--out docs/artifacts]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path


def dedupe_metrics(path: Path) -> list[dict]:
    by_epoch: dict[int, dict] = {}
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        by_epoch[rec["epoch"]] = rec  # later duplicates (post-resume replays) win
    return [by_epoch[e] for e in sorted(by_epoch)]


def excerpt_log(path: Path, keep_every: int = 500) -> str:
    """Resume/start/checkpoint/eval/eye-test lines plus sparse progress lines."""
    keep_pat = re.compile(
        r"resumed from|resume=auto|epoch \d+/\d+ starting|epoch \d+ done|"
        r"checkpoint saved|eye test|EVAL |compiling train step|loading cached|corpus"
    )
    out, batch_seen = [], 0
    for line in path.read_text(errors="replace").splitlines():
        if keep_pat.search(line):
            out.append(line)
        elif " batch " in line:
            batch_seen += 1
            if batch_seen % keep_every == 0:
                out.append(line)
    return "\n".join(out) + "\n"


def summary_markdown(metrics: list[dict], eval_results: dict | None) -> str:
    lines = ["", "## Final results (round 3)", ""]
    if metrics:
        last = metrics[-1]
        tenth = metrics[:: max(1, len(metrics) // 10)]
        lines += [
            f"Completed **{last['epoch']} epochs** (global step {last['step']}); "
            f"final epoch mean loss **{last['mean_loss']:.4f}**.",
            "",
            "| epoch | mean loss | lines/s | lr |",
            "|---|---|---|---|",
        ]
        for r in tenth + ([last] if last is not tenth[-1] else []):
            lines.append(f"| {r['epoch']} | {r['mean_loss']:.4f} | {r['lines_per_sec']} | {r['lr']:.2e} |")
        lines.append("")
    if eval_results:
        lines += [
            "Held-out CER (500 fresh-seed lines per split, generator-side clean):",
            "",
            "| split | beam | mean CER | exact match |",
            "|---|---|---|---|",
        ]
        for key in sorted(eval_results):
            r = eval_results[key]
            split, beam = key.rsplit("_beam", 1)
            lines.append(
                f"| {split} | {beam} | {r['mean_cer'] * 100:.2f}% | {r['exact_match'] * 100:.1f}% |"
            )
        lines.append("")
    return "\n".join(lines)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/root/ref_scale_run")
    p.add_argument("--log", default="/root/ref_train.log")
    p.add_argument("--out", default=str(Path(__file__).resolve().parents[1] / "docs" / "artifacts"))
    p.add_argument("--no-append", action="store_true", help="Skip appending to REF_SCALE_RUN.md")
    args = p.parse_args()

    work, out = Path(args.workdir), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    metrics = dedupe_metrics(work / "epoch_metrics.jsonl")
    (out / "epoch_metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in metrics) + "\n"
    )
    print(f"epoch_metrics.jsonl: {len(metrics)} epochs -> {out}")

    eval_results = None
    ev = work / "eval_results.json"
    if ev.exists():
        eval_results = json.loads(ev.read_text())
        (out / "eval_results.json").write_text(json.dumps(eval_results, indent=2))
        print(f"eval_results.json: {list(eval_results)} -> {out}")
    else:
        print("eval_results.json missing (training still running?)")

    log = Path(args.log)
    if log.exists():
        (out / "train_log_excerpt.txt").write_text(excerpt_log(log))
        print(f"train_log_excerpt.txt -> {out}")

    md = summary_markdown(metrics, eval_results)
    print(md)
    if not args.no_append:
        doc = Path(__file__).resolve().parents[1] / "docs" / "REF_SCALE_RUN.md"
        text = doc.read_text()
        marker = "## Final results (round 3)"
        if marker in text:  # idempotent re-run: replace the section
            text = text[: text.index(marker)].rstrip() + "\n"
        doc.write_text(text + md)
        print(f"appended summary to {doc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
