"""End-to-end learning demo: generate synthetic Khmer lines, train the flagship
SE model, and evaluate CER on a held-out split.

This is the framework equivalent of the reference's notebook workflow
(generate -> train with augmentation -> CER eval, CNN-Transformer.ipynb) as one
runnable script on TPU.

Usage: python examples/train_synthetic_demo.py [--train-n 20000] [--epochs 10]
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

logger = logging.getLogger("train_demo")


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S")
    p = argparse.ArgumentParser()
    p.add_argument("--train-n", type=int, default=20000)
    p.add_argument("--eval-n", type=int, default=500)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--words", type=int, default=400, help="Vocabulary of synthetic words")
    p.add_argument("--max-words-per-line", type=int, default=5)
    p.add_argument("--augment", action="store_true", help="Train-time augmentation (off by default: eval set is clean)")
    p.add_argument("--workdir", type=str, default="/tmp/khmer_train_demo")
    p.add_argument("--backbone", type=str, default="se_vgg")
    args = p.parse_args()

    import dataclasses

    import numpy as np

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.data.generator import DocumentTextGenerator
    from khmer_ocr_tpu.infer.predictor import Predictor
    from khmer_ocr_tpu.metrics import Evaluator
    from khmer_ocr_tpu.train.data import LineDataset
    from khmer_ocr_tpu.train.loop import train

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    # --- data: shared word list, disjoint rendering seeds -------------------
    t0 = time.time()
    gen = DocumentTextGenerator(seed=0, augment=False, words_per_sample=(1, args.max_words_per_line))
    gen.words = gen.words[: args.words]  # small closed vocabulary -> learnable quickly
    train_samples = gen.generate(args.train_n, processes=8)
    gen.seed = 999  # held-out split: same distribution, fresh renders
    eval_dir = work / "eval_set"
    if not (eval_dir / "images").exists():
        gen.generate(args.eval_n, out_dir=eval_dir, processes=8)
    logger.info("data ready: %d train, %d eval (%.0fs)", len(train_samples), args.eval_n, time.time() - t0)

    # --- config --------------------------------------------------------------
    config = OCRConfig()
    config = config.replace(
        model=config.model.replace(backbone=args.backbone, use_bilstm=args.backbone == "se_vgg"),
        train=dataclasses.replace(
            config.train,
            batch_size=args.batch_size,
            epoch_sample_size=args.train_n,
            num_epochs=args.epochs,
            checkpoint_every_epochs=max(args.epochs // 2, 1),
        ),
    )

    dataset = LineDataset(train_samples, augment=args.augment, train_cfg=config.train)
    state = train(dataset, config, checkpoint_dir=work / "ckpts", num_epochs=args.epochs, eye_test_every=150)

    # --- eval ---------------------------------------------------------------
    mcfg = config.model.replace(vocab_size=len(dataset.tokenizer), pad_idx=dataset.tokenizer.pad_idx)
    predictor = Predictor(params=state.params, batch_stats=state.batch_stats, model_cfg=mcfg)
    for beam in (1, 3):
        ev = Evaluator(lambda paths, b=beam: predictor.predict_batch(paths, beam_width=b, batch_size=64))
        res = ev.evaluate_split(eval_dir, report_path=work / f"failures_beam{beam}.txt")
        logger.info("EVAL beam=%d: %s", beam, res.summary())
        (work / f"eval_beam{beam}.json").write_text(json.dumps({
            "mean_cer": res.mean_cer, "exact_match": res.exact_match_accuracy, "n": res.num_samples,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
