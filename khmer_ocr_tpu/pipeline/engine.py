"""Document OCR pipeline: detection -> crop -> batched TPU recognition.

Reference: `KhmerOCRPipeline` + `netra_ocr` CLI (netra_ocr/ocr_engine.py:13-129).
Engines: 'custom' = the JAX SegFormer layout stack (detection/), 'surya' = the
host-side Surya wrapper (detection/surya.py). Text elements are filtered to the
text class ids, y-sorted, padded, and recognized in one batched TPU pass.
"""

from __future__ import annotations

import logging
import shutil
from pathlib import Path

from PIL import Image

from ..detection.config import LayoutConfig
from ..infer.api import recognize_batch

logger = logging.getLogger(__name__)


class KhmerOCRPipeline:
    def __init__(self, engine: str = "surya", layout_model_dir: str | None = None,
                 recognizer_model_path: str | None = None, vocab_path: str | None = None,
                 recognize_fn=None):
        """``recognize_fn``: optional recognize_batch-compatible callable
        ``(crops, beam_width, batch_size, model_path, vocab_path) -> [str]``;
        defaults to the public api singleton (infer/api.py). Lets callers with
        an in-memory Predictor (benchmarks, services) use the pipelined path
        without a checkpoint on disk."""
        self.engine = engine
        self.layout_cfg = LayoutConfig()
        self.text_ids = set(self.layout_cfg.text_classes)
        self.recognizer_model_path = recognizer_model_path
        self.vocab_path = vocab_path
        self.recognize_fn = recognize_fn
        if engine == "custom":
            from ..detection.detector import LayoutInference

            if layout_model_dir is None:
                raise ValueError("engine='custom' needs layout_model_dir (HF SegFormer checkpoint)")
            self.detector = LayoutInference(layout_model_dir)
        elif engine != "surya":
            raise ValueError(f"Unknown engine {engine!r} (use 'surya' or 'custom')")

    def _crops_from_elements(self, img: Image.Image, elements, padding: int) -> list[Image.Image]:
        text_elements = [e for e in elements if e[1] in self.text_ids]
        text_elements.sort(key=lambda e: e[0][1])  # top-to-bottom
        w, h = img.size
        return [
            img.crop((max(0, x1 - padding), max(0, y1 - padding),
                      min(w, x2 + padding), min(h, y2 + padding)))
            for (x1, y1, x2, y2), _ in text_elements
        ]

    def _detect_crops(self, image_path: str, padding: int) -> list[Image.Image]:
        if self.engine == "surya":
            from ..detection.surya import run_textline_detector

            crops_with_coords, _ = run_textline_detector(image_path, expansion_px=2, padding_px=padding)
            return [c for c, _ in crops_with_coords]
        img = Image.open(image_path).convert("RGB")
        _, elements = self.detector.run(image_path)
        return self._crops_from_elements(img, elements, padding)

    def _detect_crops_batch(self, image_paths: list, padding: int) -> list[list[Image.Image]]:
        """Detection for a GROUP of pages. engine='custom' batches the
        SegFormer forwards into one device program per group and transfers
        model-resolution maps (detection/detector.py::predict_maps_batch —
        the round-4 doc-throughput fix); surya stays per-page."""
        if self.engine != "custom" or getattr(self, "detector", None) is None:
            return [self._detect_crops(p, padding) for p in image_paths]
        images = [Image.open(p).convert("RGB") for p in image_paths]
        from ..detection.postprocess import extract_layout_elements

        out = []
        for img, (_, cm, hm) in zip(images, self.detector.predict_maps_batch(images, group=4)):
            _, elements = extract_layout_elements(img, cm, hm, self.detector.cfg)
            out.append(self._crops_from_elements(img, elements, padding))
        return out

    def process_image(self, image_path: str, output_path: str | None = None,
                      save_debug: bool = False, padding: int = 6,
                      beam_width: int = 1, batch_size: int = 8) -> str:
        image_path = str(image_path)
        if not Path(image_path).exists():
            raise FileNotFoundError(f"Image not found at: {image_path}")
        logger.info("Step 1: detecting layout (%s) for %s", self.engine, image_path)
        crops = self._detect_crops(image_path, padding)
        if not crops:
            logger.warning("No text elements found.")
            return ""
        logger.info("Step 2: recognizing %d lines (batch %d)", len(crops), batch_size)
        recognitions = (self.recognize_fn or recognize_batch)(
            crops, beam_width=beam_width, batch_size=batch_size,
            model_path=self.recognizer_model_path, vocab_path=self.vocab_path,
        )
        if save_debug:
            debug_dir = Path(f"debug_{Path(image_path).stem}_{self.engine}")
            if debug_dir.exists():
                shutil.rmtree(debug_dir)
            debug_dir.mkdir(parents=True)
            for i, (crop, text) in enumerate(zip(crops, recognitions)):
                crop.save(debug_dir / f"line_{i:03d}.png")
                (debug_dir / f"line_{i:03d}.txt").write_text(text, encoding="utf-8")
        final_text = "\n".join(recognitions)
        if output_path:
            Path(output_path).write_text(final_text, encoding="utf-8")
            logger.info("Step 3: saved to %s", output_path)
        return final_text

    def process_pages(self, image_paths, output_dir: str | None = None,
                      padding: int = 6, beam_width: int = 3, batch_size: int = 64,
                      pages_per_batch: int = 4, queue_depth: int = 4,
                      flush_lines: int = 256) -> list[str]:
        """Pipelined multi-page OCR (the serving path for documents).

        A detection worker thread streams per-page crop lists through a
        bounded queue while the main thread batch-recognizes them — so page
        N+1's detection overlaps page N's TPU decode instead of starving it
        (SURVEY §7 hard-part 6; the reference processes pages strictly
        sequentially, ocr_engine.py:37-102). The worker detects in GROUPS of
        ``pages_per_batch`` pages — with engine='custom' that is one batched
        SegFormer program + one model-resolution transfer per group
        (_detect_crops_batch) instead of a lone dispatch per page.

        Recognition flushes once the pending crops reach ``flush_lines``
        (default 256 — full device-rate buckets; the round-4 VERDICT fix for
        page-sized 18-line batches) or at end of stream, whichever first.
        Returns the per-page texts; with ``output_dir`` each page also
        writes ``<stem>.txt``.
        """
        import queue as queue_mod
        import threading

        paths = [str(p) for p in image_paths]
        q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, queue_depth))
        worker_err: list[BaseException] = []
        group = max(1, pages_per_batch)

        def detect_worker():
            try:
                for g0 in range(0, len(paths), group):
                    part = paths[g0 : g0 + group]
                    for i, crops in enumerate(self._detect_crops_batch(part, padding)):
                        q.put((g0 + i, crops))
            except BaseException as e:  # surfaced in the main thread
                worker_err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=detect_worker, name="khmer-ocr-detect", daemon=True)
        t.start()
        texts: list[str] = [""] * len(paths)
        pending: list[tuple[int, list]] = []

        def flush():
            flat = [c for _, crops in pending for c in crops]
            if flat:
                rec = (self.recognize_fn or recognize_batch)(
                    flat, beam_width=beam_width, batch_size=batch_size,
                    model_path=self.recognizer_model_path, vocab_path=self.vocab_path,
                )
                off = 0
                for i, crops in pending:
                    texts[i] = "\n".join(rec[off : off + len(crops)])
                    off += len(crops)
            pending.clear()

        n_pending_lines = 0
        while (item := q.get()) is not None:
            pending.append(item)
            n_pending_lines += len(item[1])
            if n_pending_lines >= flush_lines:
                flush()
                n_pending_lines = 0
        flush()
        t.join()
        if worker_err:
            raise worker_err[0]
        if output_dir is not None:
            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            for path, text in zip(paths, texts):
                (out / f"{Path(path).stem}.txt").write_text(text, encoding="utf-8")
        return texts


def main(argv=None) -> int:
    """`khmer-ocr-pipeline` CLI — flags mirror the reference's `netra_ocr` console
    script (ocr_engine.py:104-129) plus explicit model paths (this framework
    doesn't assume weights bundled inside the package)."""
    import argparse
    import sys

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S")
    p = argparse.ArgumentParser(description="Khmer OCR holistic pipeline (TPU)")
    p.add_argument("--image", type=str, required=True,
                   help="Page image, or a DIRECTORY of pages (pipelined multi-page mode: "
                        "detection of page N+1 overlaps recognition of page N)")
    p.add_argument("--engine", type=str, choices=["custom", "surya"], default="surya")
    p.add_argument("--output", type=str, default="ocr_result.txt")
    p.add_argument("--padding", type=int, default=6)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--recognizer", type=str, required=True, help="Recognition checkpoint")
    p.add_argument("--layout-model", type=str, default=None, help="SegFormer dir (engine=custom)")
    p.add_argument("--vocab", type=str, default=None)
    args = p.parse_args(argv)
    try:
        pipeline = KhmerOCRPipeline(
            engine=args.engine, layout_model_dir=args.layout_model,
            recognizer_model_path=args.recognizer, vocab_path=args.vocab,
        )
        if Path(args.image).is_dir():
            exts = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp"}
            pages = sorted(p for p in Path(args.image).iterdir() if p.suffix.lower() in exts)
            if not pages:
                raise FileNotFoundError(f"No page images in directory {args.image}")
            pipeline.process_pages(
                pages, output_dir=args.output, padding=args.padding,
                beam_width=args.beam, batch_size=args.batch_size,
            )
        else:
            pipeline.process_image(
                image_path=args.image, output_path=args.output, save_debug=args.debug,
                padding=args.padding, beam_width=args.beam, batch_size=args.batch_size,
            )
        return 0
    except Exception as e:
        print(f"\nPipeline Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
