"""`khmer-ocr` CLI — flag-compatible with the reference's recognize CLI
(recognize_text.py:107-131: --image/--model/--vocab/--beam/--output)."""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", datefmt="%H:%M:%S")
    parser = argparse.ArgumentParser(description="Khmer OCR (TPU) — text-line recognition")
    parser.add_argument("--image", type=str, required=True, help="Path to input image")
    parser.add_argument("--model", type=str, required=True, help="Checkpoint (.pth/.safetensors or Orbax dir)")
    parser.add_argument("--vocab", type=str, default=None, help="char2idx.json (default: bundled)")
    parser.add_argument("--beam", type=int, default=3, help="Beam width (1 for greedy)")
    parser.add_argument("--output", type=str, help="Save result to text file")
    args = parser.parse_args(argv)

    from .api import recognize

    text = recognize(args.image, args.beam, args.model, args.vocab)
    print("\n" + "=" * 40)
    print(f"RESULT: {text}")
    print("=" * 40 + "\n")
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"Saved to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
