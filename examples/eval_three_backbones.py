"""Three-backbone CER comparison on the degraded eval suite (round-5 VERDICT #1+2).

The reference's central published result is the CER ordering across backbones
(/root/reference/readme.md:128-131: proposed SE+BiLSTM 1.87 < VGG 2.27 <
ResNet 2.98 on KHOB; CNN-Transformer.ipynb [cell 17], ResNet-Transformer.ipynb
[cell 17]). This evaluates every trained checkpoint from the shared-recipe
sweep (examples/train_three_backbones.sh) on:

  * the clean held-out splits (eval_doc / eval_scene), beam 1 and 3 — expected
    saturated (~0% CER: same-generator clean lines);
  * the severity-swept degraded suite of eval_doc (data/degrade.py), beam 3 —
    the discriminating axis, calibrated so CER lands in the reference's 1-10%
    real-scan range;
  * the binarize variant ([cell 20]) of each backbone on the degraded suite —
    the reference ran binarization *because* its eval scans were degraded.

Writes docs/artifacts/three_backbone_cer.json and prints a markdown table.

    python examples/eval_three_backbones.py \
        [--ckpt-root /root/r5_train] [--corpus /root/ref_scale_run] \
        [--kinds blur noise ...] [--severities 1 3 5]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]
BACKBONES = ("se_vgg", "vgg", "resnet")


def latest_ckpt(root: Path) -> Path | None:
    ck = root / "ckpts"
    if not ck.exists():
        return None
    epochs = sorted(p for p in ck.iterdir() if p.name.startswith("epoch") and (p / "state").exists())
    return epochs[-1] if epochs else None


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-root", default="/root/r5_train",
                   help="Prefix: checkpoints live at <root>_<backbone>/ckpts/epochNNN")
    p.add_argument("--corpus", default="/root/ref_scale_run")
    p.add_argument("--kinds", nargs="+", default=None)
    p.add_argument("--severities", nargs="+", type=int, default=None)
    p.add_argument("--beam", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--skip-clean", action="store_true")
    p.add_argument("--skip-binarize", action="store_true")
    p.add_argument("--out", default=str(REPO / "docs" / "artifacts" / "three_backbone_cer.json"))
    args = p.parse_args()

    from khmer_ocr_tpu.data.degrade import DEFAULT_KINDS, DEFAULT_SEVERITIES, build_degraded_suite
    from khmer_ocr_tpu.evaluate import make_tpu_recognizer
    from khmer_ocr_tpu.metrics import Evaluator
    from khmer_ocr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    corpus = Path(args.corpus)
    kinds = tuple(args.kinds) if args.kinds else DEFAULT_KINDS
    severities = tuple(args.severities) if args.severities else DEFAULT_SEVERITIES

    print("building/caching degraded suite ...", flush=True)
    suite = build_degraded_suite(corpus / "eval_doc", kinds=kinds, severities=severities)

    models: list[tuple[str, Path]] = []
    for bb in BACKBONES:
        ck = latest_ckpt(Path(f"{args.ckpt_root}_{bb}"))
        if ck is None:
            print(f"WARNING: no checkpoint for {bb} under {args.ckpt_root}_{bb} — skipped")
            continue
        models.append((bb, ck))
    flagship = REPO / "checkpoints" / "se_vgg_flagship"
    if flagship.exists():
        models.append(("se_vgg_flagship(in-repo)", flagship))

    results: dict = {"kinds": list(kinds), "severities": list(severities),
                     "beam": args.beam, "models": {}}
    for name, ck in models:
        t0 = time.time()
        row: dict = {"checkpoint": str(ck), "clean": {}, "degraded": {}, "degraded_binarize": {}}
        rec = make_tpu_recognizer(ck, beam_width=args.beam, batch_size=args.batch_size)
        ev = Evaluator(rec)
        if not args.skip_clean:
            for split in ("eval_doc", "eval_scene"):
                for beam in (1, args.beam):
                    r1 = Evaluator(make_tpu_recognizer(ck, beam_width=beam,
                                                       batch_size=args.batch_size)
                                   ).evaluate_split(corpus / split)
                    row["clean"][f"{split}_beam{beam}"] = {
                        "cer": r1.mean_cer, "exact": r1.exact_match_accuracy, "n": r1.num_samples}
                    print(f"{name} clean {split} beam{beam}: CER {r1.mean_cer:.4%}", flush=True)
        for sname, sdir in sorted(suite.items()):
            r = ev.evaluate_split(sdir)
            row["degraded"][sname] = {"cer": r.mean_cer, "exact": r.exact_match_accuracy}
            print(f"{name} degraded/{sname}: CER {r.mean_cer:.4%}", flush=True)
        if not args.skip_binarize:
            # binarize variant on the degraded suite — its actual purpose
            evb = Evaluator(make_tpu_recognizer(ck, beam_width=args.beam,
                                                batch_size=args.batch_size, binarize=True))
            for sname, sdir in sorted(suite.items()):
                r = evb.evaluate_split(sdir)
                row["degraded_binarize"][sname] = {"cer": r.mean_cer, "exact": r.exact_match_accuracy}
            print(f"{name} binarize pass done", flush=True)
        cers = [v["cer"] for v in row["degraded"].values()]
        row["degraded_mean_cer"] = sum(cers) / len(cers) if cers else None
        row["eval_seconds"] = round(time.time() - t0, 1)
        results["models"][name] = row
        print(f"== {name}: degraded mean CER {row['degraded_mean_cer']:.4%} "
              f"({row['eval_seconds']}s)", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))

    # markdown table: one row per model, one column per kind (mean over severities)
    names = list(results["models"])
    if names:
        print("\n| model | " + " | ".join(kinds) + " | mix | mean |")
        print("|" + "---|" * (len(kinds) + 3))
        for n in names:
            deg = results["models"][n]["degraded"]
            cells = []
            for k in list(kinds) + ["mix"]:
                vals = [deg[f"{k}_s{s}"]["cer"] for s in severities if f"{k}_s{s}" in deg]
                cells.append(f"{sum(vals)/len(vals):.2%}" if vals else "-")
            cells.append(f"{results['models'][n]['degraded_mean_cer']:.2%}")
            print(f"| {n} | " + " | ".join(cells) + " |")
    print(f"\nwrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
