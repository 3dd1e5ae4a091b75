"""Reference-scale training run: the full recipe from readme.md:105-114 /
CNN-Transformer.ipynb [cell 17] on TPU.

  * 200k synthetic lines from BOTH generators (100k augmented document-style +
    100k scene-style, the reference's corpus mix, readme.md:48-58)
  * 100 epochs, each over a random 50k subsample, batch 32
  * Adam + staged cyclic LR (fixed 1e-4 / cyclic 1e-5..1e-4 / cyclic 1e-6..1e-5)
  * on-the-fly tensor augmentation ([cell 8])
  * Orbax checkpoints every 10 epochs; `--resume auto` continues from the
    latest checkpoint (the mid-run kill/resume proof, round-1 VERDICT #5)
  * artifacts: per-epoch loss/throughput JSONL + held-out CER (beam 1 and 3)
    on document-style and scene-style eval splits

Usage: python examples/train_reference_scale.py [--epochs 100] [--resume auto]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root (run directly from anywhere)

import argparse
import json
import logging
import time
from pathlib import Path

logger = logging.getLogger("ref_scale")


def find_latest_checkpoint(ckpt_dir: Path) -> Path | None:
    if not ckpt_dir.exists():
        return None
    epochs = sorted(p for p in ckpt_dir.iterdir() if p.name.startswith("epoch") and (p / "state").exists())
    return epochs[-1] if epochs else None


def build_corpus(work: Path, train_n: int, eval_n: int, processes: int):
    """200k two-generator training corpus + clean held-out splits, cached on disk."""
    import numpy as np

    from khmer_ocr_tpu.data.generator import DocumentTextGenerator, SceneTextGenerator

    cache = work / "train_samples.npz"
    t0 = time.time()
    doc_gen = DocumentTextGenerator(seed=0, augment=True)
    scene_gen = SceneTextGenerator(seed=1, augment=False)
    # held-out splits (fresh seeds, no generator-side augmentation for docs)
    for name, gen, seed in [("eval_doc", DocumentTextGenerator(seed=7007, augment=False), 0),
                            ("eval_scene", SceneTextGenerator(seed=7008, augment=False), 0)]:
        d = work / name
        if not (d / "images").exists():
            gen.generate(eval_n, out_dir=d, processes=processes)
            logger.info("%s ready (%d lines)", name, eval_n)

    if cache.exists():
        logger.info("loading cached training corpus %s", cache)
        data = np.load(cache, allow_pickle=True)
        return list(zip(list(data["images"]), list(data["labels"]))), None

    def _save(path: Path, samples_):
        images = np.empty(len(samples_), object)
        images[:] = [img for img, _ in samples_]
        labels = np.array([t for _, t in samples_], object)
        np.savez(path, images=images, labels=labels)

    def _load(path: Path):
        data = np.load(path, allow_pickle=True)
        return list(zip(list(data["images"]), list(data["labels"])))

    # Each generator half is cached independently so an interrupted build
    # resumes instead of redoing ~40 min of single-core PIL rendering.
    half = train_n // 2
    samples = []
    for name, gen, n in [("doc", doc_gen, half), ("scene", scene_gen, train_n - half)]:
        part = work / f"train_half_{name}.npz"
        if part.exists():
            logger.info("loading cached %s half %s", name, part)
            samples += _load(part)
        else:
            got = gen.generate(n, processes=processes)
            _save(part, got)
            logger.info("%s half ready + cached: %d (%.0fs)", name, len(got), time.time() - t0)
            samples += got
    logger.info("corpus ready: %d lines (%.0fs)", len(samples), time.time() - t0)
    _save(cache, samples)
    logger.info("corpus cached -> %s", cache)
    return samples, cache


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S")
    p = argparse.ArgumentParser()
    p.add_argument("--train-n", type=int, default=200_000)
    p.add_argument("--eval-n", type=int, default=500)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--sample-per-epoch", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--processes", type=int, default=1)
    p.add_argument("--workdir", type=str, default="/root/ref_scale_run")
    p.add_argument("--corpus-dir", type=str, default=None,
                   help="Directory holding/receiving the cached corpus + eval splits "
                        "(default: workdir). Lets per-backbone runs share one corpus.")
    p.add_argument("--backbone", type=str, default="se_vgg")
    p.add_argument("--resume", type=str, default=None, help="'auto' or a checkpoint dir")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--skip-eval", action="store_true")
    p.add_argument("--corpus-only", action="store_true",
                   help="Build + cache the corpus and eval splits, then exit (CPU-only)")
    p.add_argument("--precision", type=str, default="default",
                   choices=["default", "high", "highest"],
                   help="Train-step matmul precision. 'default' = single-pass bf16 "
                        "MXU with f32 accumulation (standard mixed-precision "
                        "training, ~6x the MXU rate of 'highest'); serving/eval "
                        "keeps the parity-exact 'highest' default regardless.")
    p.add_argument("--dispatch-group", type=int, default=8,
                   help="K same-shape batches per device dispatch (train/loop.py). "
                        "1 disables grouped multi-step dispatch — smaller compiled "
                        "programs, one host dispatch per step")
    p.add_argument("--host-augment", action="store_true",
                   help="cv2 augmentation on host CPU (legacy; ~10x slower input "
                        "pipeline on one core) instead of on-device (the default)")
    args = p.parse_args()

    import dataclasses

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.train.data import LineDataset
    from khmer_ocr_tpu.train.loop import train

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    corpus_dir = Path(args.corpus_dir) if args.corpus_dir else work
    corpus_dir.mkdir(parents=True, exist_ok=True)
    samples, _cache = build_corpus(corpus_dir, args.train_n, args.eval_n, args.processes)
    if args.corpus_only:
        logger.info("corpus-only run complete (%d lines)", len(samples))
        return 0

    config = OCRConfig()
    config = config.replace(
        model=config.model.replace(backbone=args.backbone, use_bilstm=args.backbone == "se_vgg"),
        runtime=dataclasses.replace(config.runtime, matmul_precision=args.precision),
        train=dataclasses.replace(
            config.train,
            batch_size=args.batch_size,
            epoch_sample_size=args.sample_per_epoch,
            num_epochs=args.epochs,
            checkpoint_every_epochs=10,  # reference: every 10 epochs [cell 17]
        ),
    )
    dataset = LineDataset(samples, augment=True, train_cfg=config.train,
                          device_augment=not args.host_augment)

    resume_from = None
    if args.resume == "auto":
        resume_from = find_latest_checkpoint(work / "ckpts")
        logger.info("resume=auto -> %s", resume_from)
    elif args.resume:
        resume_from = Path(args.resume)

    mesh = None
    if args.data_parallel:
        from khmer_ocr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    state = train(
        dataset, config, checkpoint_dir=work / "ckpts", mesh=mesh,
        num_epochs=args.epochs, resume_from=resume_from,
        metrics_path=work / "epoch_metrics.jsonl", eye_test_every=1000,
        dispatch_group=args.dispatch_group,
    )

    if args.skip_eval:
        return 0

    # --- held-out CER, beam 1 and beam 3 (the published-CER setting) ---------
    from khmer_ocr_tpu.infer.predictor import Predictor
    from khmer_ocr_tpu.metrics import Evaluator

    mcfg = config.model.replace(vocab_size=len(dataset.tokenizer), pad_idx=dataset.tokenizer.pad_idx)
    predictor = Predictor(params=state.params, batch_stats=state.batch_stats, model_cfg=mcfg)
    results = {}
    for split in ("eval_doc", "eval_scene"):
        for beam in (1, 3):
            ev = Evaluator(lambda paths, b=beam: predictor.predict_batch(paths, beam_width=b, batch_size=64))
            res = ev.evaluate_split(corpus_dir / split, report_path=work / f"{split}_failures_beam{beam}.txt")
            logger.info("EVAL %s beam=%d: %s", split, beam, res.summary())
            results[f"{split}_beam{beam}"] = {
                "mean_cer": res.mean_cer, "exact_match": res.exact_match_accuracy, "n": res.num_samples,
            }
    (work / "eval_results.json").write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
