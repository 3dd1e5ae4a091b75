"""Evaluation metrics: Levenshtein distance, CER, and the folder-pair Evaluator.

Reference: CNN-Transformer.ipynb [cells 19,21-23] — pure-Python Levenshtein,
``cer = distance / len(ref)`` with the edge cases: 0.0 when both empty, 1.0 when
ref empty but hyp non-empty. ``Evaluator`` walks ``<root>/{images,labels}`` folder
pairs, averages per-sample CER, and reports exact-match accuracy plus a failure
report. The DP here is vectorized over numpy rows instead of the reference's
character-at-a-time Python loops.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

IMG_EXTS = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp", ".webp"}


def levenshtein(ref: str, hyp: str) -> int:
    """Edit distance (insert/delete/substitute, all cost 1)."""
    if ref == hyp:
        return 0
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    r = np.frombuffer(ref.encode("utf-32-le"), dtype=np.uint32)
    h = np.frombuffer(hyp.encode("utf-32-le"), dtype=np.uint32)
    # Row-vectorized DP: prev[j] = D(i-1, j). The substitution/deletion terms are
    # elementwise; the insertion term is a prefix scan handled by the inner
    # minimum.accumulate.
    prev = np.arange(h.size + 1, dtype=np.int64)
    for i in range(1, r.size + 1):
        sub = prev[:-1] + (h != r[i - 1])
        cur = np.empty_like(prev)
        cur[0] = i
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertion: cur[j] = min(cur[j], cur[j-1] + 1) — running minimum scan
        np.minimum.accumulate(cur + np.arange(cur.size, 0, -1), out=cur)
        cur -= np.arange(cur.size, 0, -1)
        prev = cur
    return int(prev[-1])


def calculate_cer(reference: str, hypothesis: str) -> float:
    """Character error rate = edit_distance / len(reference)."""
    if len(reference) == 0:
        return 0.0 if len(hypothesis) == 0 else 1.0
    return levenshtein(reference, hypothesis) / len(reference)


@dataclasses.dataclass
class EvalResult:
    mean_cer: float
    exact_match_accuracy: float
    num_samples: int
    failures: list[tuple[str, str, str, float]]  # (name, ref, hyp, cer)

    def summary(self) -> str:
        return (
            f"samples={self.num_samples} mean_cer={self.mean_cer:.4%} "
            f"exact_match={self.exact_match_accuracy:.4%}"
        )


class Evaluator:
    """CER harness over ``<root>/{images,labels}`` folder pairs.

    ``recognize_fn`` maps a list of image paths to a list of strings (so batched
    TPU decoding is used end to end). Mirrors the reference Evaluator's metrics:
    per-sample CER averaged, exact-match accuracy, failure report
    (CNN-Transformer.ipynb [cell 19]).
    """

    def __init__(self, recognize_fn, failure_threshold: float = 0.10):
        self.recognize_fn = recognize_fn
        self.failure_threshold = failure_threshold

    @staticmethod
    def _pairs(split_dir: str | Path) -> list[tuple[Path, Path]]:
        split_dir = Path(split_dir)
        img_dir, lab_dir = split_dir / "images", split_dir / "labels"
        if not img_dir.is_dir() or not lab_dir.is_dir():
            raise FileNotFoundError(f"Expected {split_dir}/images and {split_dir}/labels")
        pairs = []
        for img in sorted(img_dir.iterdir()):
            if img.suffix.lower() not in IMG_EXTS:
                continue
            lab = lab_dir / (img.stem + ".txt")
            if lab.exists():
                pairs.append((img, lab))
        return pairs

    def evaluate_split(self, split_dir: str | Path, report_path: str | Path | None = None) -> EvalResult:
        pairs = self._pairs(split_dir)
        refs = [p[1].read_text(encoding="utf-8").strip() for p in pairs]
        hyps = self.recognize_fn([str(p[0]) for p in pairs])
        # batch distances through the native C++ kernel when available
        from .native import levenshtein_batch

        distances = levenshtein_batch(refs, hyps)
        cers, failures, exact = [], [], 0
        for (img, _), ref, hyp, dist in zip(pairs, refs, hyps, distances):
            if len(ref) == 0:
                cer = 0.0 if len(hyp) == 0 else 1.0
            else:
                cer = float(dist) / len(ref)
            cers.append(cer)
            exact += int(ref == hyp)
            if cer > self.failure_threshold:
                failures.append((img.name, ref, hyp, cer))
        result = EvalResult(
            mean_cer=float(np.mean(cers)) if cers else 0.0,
            exact_match_accuracy=exact / len(pairs) if pairs else 0.0,
            num_samples=len(pairs),
            failures=failures,
        )
        if report_path is not None:
            lines = [result.summary(), ""]
            for name, ref, hyp, cer in failures:
                lines += [f"[{name}] cer={cer:.4f}", f"  REF: {ref}", f"  HYP: {hyp}"]
            Path(report_path).write_text("\n".join(lines), encoding="utf-8")
        return result
