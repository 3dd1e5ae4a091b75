"""Evaluator + eval CLI tests with a mock recognizer."""

import json

import numpy as np
from PIL import Image

from khmer_ocr_tpu.metrics import Evaluator
from khmer_ocr_tpu.preprocess import binarize_image


def _make_split(tmp_path, name, samples):
    root = tmp_path / name
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    for i, text in enumerate(samples):
        Image.fromarray(np.full((30, 80), 255, np.uint8)).save(root / "images" / f"s{i}.png")
        (root / "labels" / f"s{i}.txt").write_text(text, encoding="utf-8")
    return root


def test_evaluator_split(tmp_path):
    root = _make_split(tmp_path, "khob", ["ab", "cd", "ef"])
    fake = lambda paths: ["ab", "cx", "zz"]  # 0.0, 0.5, 1.0 CER
    ev = Evaluator(fake)
    res = ev.evaluate_split(root, report_path=tmp_path / "rep.txt")
    assert res.num_samples == 3
    assert res.mean_cer == (0.0 + 0.5 + 1.0) / 3
    assert res.exact_match_accuracy == 1 / 3
    assert len(res.failures) == 2
    assert "cx" in (tmp_path / "rep.txt").read_text()


def test_eval_cli_with_mock(tmp_path, monkeypatch):
    import khmer_ocr_tpu.evaluate as ev_mod

    root = _make_split(tmp_path, "legal", ["១២៣", "៤៥"])
    monkeypatch.setattr(ev_mod, "make_tpu_recognizer", lambda *a, **k: (lambda paths: ["១២៣", "៤៥"]))
    rc = ev_mod.main(["--data", str(root), "--model", "dummy.pth", "--report-dir", str(tmp_path / "out")])
    assert rc == 0
    results = json.loads((tmp_path / "out" / "results.json").read_text())
    assert results["legal"]["mean_cer"] == 0.0
    assert results["legal"]["exact_match_accuracy"] == 1.0


def test_binarize_variant():
    rng = np.random.RandomState(0)
    # gray-ish text on light background -> binarized to pure 0/255
    arr = np.full((40, 120), 220, np.uint8)
    arr[10:30, 20:100] = 90
    out = np.asarray(binarize_image(Image.fromarray(arr)))
    assert set(np.unique(out)) <= {0, 255}
    assert (out[15, 50] == 0) and (out[5, 5] == 255)
