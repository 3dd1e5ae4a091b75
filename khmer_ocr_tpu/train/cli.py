"""`khmer-ocr-train` CLI: train on generated or folder data (the reference has
no train script — only notebooks, SURVEY.md L7; this fills that gap)."""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S")
    p = argparse.ArgumentParser(description="Train the Khmer OCR recognizer (TPU)")
    p.add_argument("--data", type=str, help="images/+labels/ folder-pair dataset root")
    p.add_argument("--synthetic", type=int, default=0, help="Generate N synthetic lines instead")
    p.add_argument("--font-dir", type=str, default=None)
    p.add_argument("--corpus", type=str, default=None)
    p.add_argument("--backbone", type=str, default="se_vgg", choices=["se_vgg", "vgg", "resnet"])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    p.add_argument("--data-parallel", action="store_true", help="Shard batches over all devices")
    p.add_argument("--resume", type=str, default=None, help="Checkpoint dir to resume from")
    p.add_argument("--host-augment", action="store_true",
                   help="Run augmentation on host CPU (cv2) instead of on-device "
                        "(default: on-device — the host pipeline is ~10x slower per core)")
    args = p.parse_args(argv)

    import dataclasses

    from ..config import OCRConfig
    from .data import LineDataset, load_folder_dataset
    from .loop import train

    config = OCRConfig()
    config = config.replace(model=config.model.replace(
        backbone=args.backbone, use_bilstm=args.backbone == "se_vgg"))
    if args.batch_size:
        config = config.replace(train=dataclasses.replace(config.train, batch_size=args.batch_size))

    if args.synthetic:
        from ..data.generator import DocumentTextGenerator

        gen = DocumentTextGenerator(font_dir=args.font_dir, corpus_path=args.corpus)
        samples = gen.generate(args.synthetic, processes=4)
        dataset = LineDataset(samples, augment=True, train_cfg=config.train,
                              device_augment=not args.host_augment)
    elif args.data:
        dataset = load_folder_dataset(args.data)
        dataset.augmenter = None
    else:
        p.error("Provide --data or --synthetic N")
        return 2

    mesh = None
    if args.data_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    train(dataset, config, checkpoint_dir=args.checkpoint_dir, mesh=mesh, num_epochs=args.epochs,
          resume_from=args.resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
