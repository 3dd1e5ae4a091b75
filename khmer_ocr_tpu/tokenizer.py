"""Character tokenizer (reference: netra_ocr/recognition/tokenizer.py:4-38).

Vocabulary is a char -> id JSON map (124 entries: <pad>=0, <unk>=1, <sos>=2,
<eos>=3, then ASCII + Khmer code points). ``decode`` skips <sos>/<pad> and stops
at <eos>. ``encode`` adds <sos>/<eos> framing and falls back to <unk>
(CNN-Transformer.ipynb [cell 9] label construction).
"""

from __future__ import annotations

import json
from importlib import resources
from pathlib import Path

import numpy as np

_DEFAULT_VOCAB = "char2idx.json"


def default_vocab_path() -> Path:
    return Path(str(resources.files("khmer_ocr_tpu").joinpath("assets", _DEFAULT_VOCAB)))


class Tokenizer:
    def __init__(self, char2idx_path: str | Path | None = None):
        path = Path(char2idx_path) if char2idx_path else default_vocab_path()
        if not path.exists():
            raise FileNotFoundError(f"Vocab file not found: {path}")
        with open(path, "r", encoding="utf-8") as f:
            self.char2idx: dict[str, int] = json.load(f)
        self.idx2char = {v: k for k, v in self.char2idx.items()}
        # Fallbacks match the reference's (tokenizer.py:12-14); the bundled JSON
        # overrides them with pad=0, unk=1, sos=2, eos=3.
        self.sos_idx = self.char2idx.get("<sos>", 1)
        self.eos_idx = self.char2idx.get("<eos>", 2)
        self.pad_idx = self.char2idx.get("<pad>", 0)
        self.unk_idx = self.char2idx.get("<unk>", 1)

    def __len__(self) -> int:
        return len(self.char2idx)

    def encode(self, text: str, add_special: bool = True) -> list[int]:
        ids = [self.char2idx.get(ch, self.unk_idx) for ch in text]
        if add_special:
            return [self.sos_idx] + ids + [self.eos_idx]
        return ids

    def encode_padded(self, texts: list[str], max_len: int) -> tuple[np.ndarray, np.ndarray]:
        """Batch-encode to a fixed (B, max_len) int32 array + length vector.

        Labels longer than max_len are truncated keeping the trailing <eos>.
        """
        out = np.full((len(texts), max_len), self.pad_idx, dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            if len(ids) > max_len:
                ids = ids[: max_len - 1] + [self.eos_idx]
            out[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return out, lengths

    def decode(self, token_ids) -> str:
        """Ids -> string: skip <sos>/<pad>, stop at <eos>, unknown ids -> ''."""
        result = []
        for idx in np.asarray(token_ids).tolist():
            idx = int(idx)
            if idx == self.sos_idx or idx == self.pad_idx:
                continue
            if idx == self.eos_idx:
                break
            result.append(self.idx2char.get(idx, ""))
        return "".join(result)

    def decode_batch(self, token_ids) -> list[str]:
        arr = np.asarray(token_ids)
        return [self.decode(row) for row in arr]
