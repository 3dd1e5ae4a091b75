"""`khmer-ocr-layout` CLI (reference: detector.py argparse CLI, detector.py:106-136)."""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S")
    p = argparse.ArgumentParser(description="Khmer OCR layout detection (TPU SegFormer)")
    p.add_argument("--image", type=str, required=True, help="Input page image")
    p.add_argument("--model", type=str, required=True, help="HF SegFormer checkpoint dir")
    p.add_argument("--output", type=str, default="detection_results", help="Artifact directory")
    args = p.parse_args(argv)

    from pathlib import Path

    from .detector import LayoutInference

    engine = LayoutInference(args.model)
    stem = Path(args.image).stem
    _, elements = engine.run(args.image, output_dir=args.output, stem=stem)
    print(f"{len(elements)} layout elements -> {args.output}/{stem}_layout.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
