"""Synthetic training-data factory: document-style and scene-style text lines.

Reference counterparts: scripts/generate_document_text.py (Pillow corpus text on
white, optional noise/blur/rotation augmentation, multiprocessing pool, HF
dataset export) and scripts/generate_scene_text.py (background-composited text
with contrast-aware color). Re-designed around a worker-pool of pure functions
returning (np.uint8 image, label) pairs; output goes to images/+labels/ folder
pairs (the evaluator's layout) and/or a HuggingFace dataset.

Fonts: any directory of Khmer-capable .ttf files (the reference bundles 11 in
fonts/). Corpus: one word per whitespace token of a UTF-8 text file; without a
corpus, words are sampled from the vocabulary's Khmer consonant/vowel ranges so
the pipeline is runnable end-to-end out of the box.
"""

from __future__ import annotations

import dataclasses
import multiprocessing
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw, ImageFont

# consonants restricted to the recognition vocabulary (char2idx.json) — the
# raw Unicode range includes the obsolete ឝ/ឞ which the vocab maps to <unk>
KHMER_CONSONANTS = [chr(c) for c in range(0x1780, 0x17A3) if c not in (0x179D, 0x179E)]
KHMER_VOWELS = [chr(c) for c in range(0x17B6, 0x17C6)]
KHMER_SIGNS = ["្"]  # coeng


def _default_words(rng: np.random.Generator, n: int = 4000) -> list[str]:
    words = []
    for _ in range(n):
        length = int(rng.integers(2, 8))
        chars = []
        for _ in range(length):
            chars.append(str(rng.choice(KHMER_CONSONANTS)))
            if rng.random() < 0.25:
                chars.append(KHMER_SIGNS[0] + str(rng.choice(KHMER_CONSONANTS)))
            if rng.random() < 0.6:
                chars.append(str(rng.choice(KHMER_VOWELS)))
        words.append("".join(chars))
    return words


def load_corpus_words(corpus_path: str | Path | None, rng: np.random.Generator) -> list[str]:
    """Word pool for text generation, in preference order: an explicit corpus
    file (the reference's texts/khmer_corpus.txt — stripped from this mirror),
    the packaged ``corpus_seed.txt`` (1.5k REAL Khmer words recovered from the
    reference notebooks' own printed training samples — genuine orthography and
    vocabulary), then the synthetic consonant/vowel fallback."""
    if corpus_path == "none":  # explicit synthetic-words request (bench uses it
        return _default_words(rng)  # to keep its workload comparable across rounds)
    candidates = [corpus_path, Path(__file__).parent / "corpus_seed.txt"]
    for cand in candidates:
        if cand and Path(cand).exists():
            text = Path(cand).read_text(encoding="utf-8")
            words = [w for w in text.split() if w]
            if words:
                return words
    return _default_words(rng)


def find_fonts(font_dir: str | Path | None) -> list[Path]:
    for candidate in ([Path(font_dir)] if font_dir else []) + [
        Path(__file__).parent / "fonts",
        Path("/root/reference/fonts"),
    ]:
        if candidate and candidate.is_dir():
            fonts = sorted(candidate.glob("*.ttf")) + sorted(candidate.glob("*.otf"))
            if fonts:
                return fonts
    raise FileNotFoundError("No .ttf fonts found; pass font_dir=")


def render_text_line(text: str, font_path: str | Path, font_size: int = 14,
                     pad: int = 6, fg: int = 0, bg: int = 255) -> np.ndarray:
    """Render a text line to a uint8 grayscale array with a dynamic canvas
    (reference generate_document_text.py: textbbox-sized canvas, RAQM layout if
    available for correct Khmer shaping)."""
    try:
        font = ImageFont.truetype(str(font_path), font_size, layout_engine=ImageFont.Layout.RAQM)
    except Exception:
        font = ImageFont.truetype(str(font_path), font_size)
    probe = Image.new("L", (8, 8), bg)
    bbox = ImageDraw.Draw(probe).textbbox((0, 0), text, font=font)
    w = max(bbox[2] - bbox[0], 1) + 2 * pad
    h = max(bbox[3] - bbox[1], 1) + 2 * pad
    img = Image.new("L", (w, h), bg)
    ImageDraw.Draw(img).text((pad - bbox[0], pad - bbox[1]), text, font=font, fill=fg)
    return np.asarray(img)


def _augment_document(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Document-style degradation: noise blobs, blur, small rotation
    (reference generate_document_text.py CV2 aug block)."""
    import cv2

    out = img.astype(np.float32)
    if rng.random() < 0.4:  # salt-ish noise blobs
        n_blobs = int(rng.integers(1, 6))
        for _ in range(n_blobs):
            x, y = int(rng.integers(0, img.shape[1])), int(rng.integers(0, img.shape[0]))
            r = int(rng.integers(1, 3))
            cv2.circle(out, (x, y), r, float(rng.integers(0, 120)), -1)
    if rng.random() < 0.4:
        out = cv2.GaussianBlur(out, (3, 3), float(rng.uniform(0.4, 1.0)))
    if rng.random() < 0.4:  # +-2.5 degrees rotation, white border
        angle = float(rng.uniform(-2.5, 2.5))
        h, w = out.shape
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        out = cv2.warpAffine(out, m, (w, h), borderValue=255.0)
    return np.clip(out, 0, 255).astype(np.uint8)


@dataclasses.dataclass
class DocumentTextGenerator:
    """Document-style line generator (reference P4)."""

    font_dir: str | Path | None = None
    corpus_path: str | Path | None = None
    words_per_sample: tuple[int, int] = (3, 5)
    font_size: int = 14
    augment: bool = True
    seed: int = 0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.fonts = find_fonts(self.font_dir)
        self.words = load_corpus_words(self.corpus_path, rng)

    def sample(self, rng: np.random.Generator) -> tuple[np.ndarray, str]:
        k = int(rng.integers(self.words_per_sample[0], self.words_per_sample[1] + 1))
        text = " ".join(str(rng.choice(self.words)) for _ in range(k))
        font = self.fonts[int(rng.integers(0, len(self.fonts)))]
        img = render_text_line(text, font, self.font_size)
        if self.augment:
            img = _augment_document(img, rng)
        return img, text

    def _one(self, seed: int):
        try:
            return self.sample(np.random.default_rng(seed))
        except Exception:
            return None  # reference workers also return None on failure

    def generate(self, n: int, out_dir: str | Path | None = None, processes: int = 4):
        """Generate n samples; write images/+labels/ if out_dir given; returns
        (images, labels) lists otherwise."""
        seeds = np.random.default_rng(self.seed).integers(0, 2**31, size=n).tolist()
        if processes > 1:
            # spawn, not fork: the caller's process usually holds an initialized
            # JAX/TPU client, and forking it deadlocks the children
            ctx = multiprocessing.get_context("spawn")
            with ctx.Pool(processes) as pool:
                results = [r for r in pool.imap_unordered(self._one, seeds) if r is not None]
        else:
            results = [r for r in map(self._one, seeds) if r is not None]
        if out_dir is None:
            return results
        out = Path(out_dir)
        (out / "images").mkdir(parents=True, exist_ok=True)
        (out / "labels").mkdir(parents=True, exist_ok=True)
        for i, (img, text) in enumerate(results):
            Image.fromarray(img).save(out / "images" / f"{i:06d}.png")
            (out / "labels" / f"{i:06d}.txt").write_text(text, encoding="utf-8")
        return results

    # visibility of pushed datasets: the reference pushes document data public
    # (generate_document_text.py:221, private=False) and scene data private
    # (generate_scene_text.py:226, private=True)
    hub_private: bool = dataclasses.field(default=False, init=False, repr=False)

    def to_hf_dataset(self, n: int, processes: int = 4):
        """Export as a HuggingFace dataset with image/label columns (reference
        pushes these to the Hub)."""
        import datasets as hfds

        results = self.generate(n, out_dir=None, processes=processes)
        return hfds.Dataset.from_dict(
            {"image": [Image.fromarray(img) for img, _ in results], "label": [t for _, t in results]}
        )

    def push_to_hub(self, repo_id: str, n: int, processes: int = 4, private: bool | None = None):
        """Generate and push to the HF Hub with the reference's visibility
        defaults (document public / scene private)."""
        ds = self.to_hf_dataset(n, processes=processes)
        ds.push_to_hub(repo_id, private=self.hub_private if private is None else private)
        return ds


@dataclasses.dataclass
class SceneTextGenerator(DocumentTextGenerator):
    """Scene-style generator: text composited on background crops with
    contrast-aware color (reference generate_scene_text.py:41-229)."""

    background_dir: str | Path | None = None
    font_size_range: tuple[int, int] = (16, 28)

    def __post_init__(self):
        super().__post_init__()
        self.hub_private = True  # reference pushes scene data private
        self.backgrounds = []
        if self.background_dir and Path(self.background_dir).is_dir():
            self.backgrounds = sorted(
                p for p in Path(self.background_dir).iterdir() if p.suffix.lower() in {".jpg", ".png", ".jpeg"}
            )

    def _background(self, rng: np.random.Generator, w: int, h: int) -> np.ndarray:
        if self.backgrounds:
            bg = np.asarray(Image.open(self.backgrounds[int(rng.integers(0, len(self.backgrounds)))]).convert("L"))
            if bg.shape[0] > h and bg.shape[1] > w:
                y = int(rng.integers(0, bg.shape[0] - h))
                x = int(rng.integers(0, bg.shape[1] - w))
                return bg[y : y + h, x : x + w].copy()
        # gray-noise fallback (reference generate_scene_text.py:131-137)
        base = rng.integers(60, 200)
        return np.clip(base + rng.standard_normal((h, w)) * 18, 0, 255).astype(np.uint8)

    def sample(self, rng: np.random.Generator) -> tuple[np.ndarray, str]:
        k = int(rng.integers(self.words_per_sample[0], self.words_per_sample[1] + 1))
        text = " ".join(str(rng.choice(self.words)) for _ in range(k))
        font_path = self.fonts[int(rng.integers(0, len(self.fonts)))]
        size = int(rng.integers(self.font_size_range[0], self.font_size_range[1] + 1))
        mask = render_text_line(text, font_path, size, fg=255, bg=0)
        h, w = mask.shape
        # reference layout (generate_scene_text.py:102-115): background padded
        # by 20px and the text placed at (10 + dx, 10 + dy), dx/dy in [0, 5]
        pad = 20
        bg = self._background(rng, w + pad, h + pad)
        x0 = 10 + int(rng.integers(0, 6))
        y0 = 10 + int(rng.integers(0, 6))
        # contrast-aware text color: black on bright, white on dark (mean > 127)
        color = 0 if bg.mean() > 127 else 255
        out = bg.astype(np.float32)
        alpha = mask.astype(np.float32) / 255.0
        region = out[y0 : y0 + h, x0 : x0 + w]
        out[y0 : y0 + h, x0 : x0 + w] = region * (1 - alpha) + color * alpha
        return np.clip(out, 0, 255).astype(np.uint8), text
