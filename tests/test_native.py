"""Native C++ kernel tests: build, correctness vs the numpy DP, edge cases."""

import numpy as np
import pytest

from khmer_ocr_tpu.metrics import levenshtein
from khmer_ocr_tpu.native import levenshtein_batch, load_native_library


def test_native_builds():
    lib = load_native_library()
    if lib is None:
        pytest.skip("g++ unavailable — numpy fallback covered elsewhere")


def test_batch_matches_reference_dp():
    rng = np.random.RandomState(0)
    alpha = list("កខគឃង ab១២៣")
    refs = ["".join(rng.choice(alpha, rng.randint(0, 40))) for _ in range(200)]
    hyps = ["".join(rng.choice(alpha, rng.randint(0, 40))) for _ in range(200)]
    out = levenshtein_batch(refs, hyps)
    expected = np.array([levenshtein(r, h) for r, h in zip(refs, hyps)])
    np.testing.assert_array_equal(out, expected)


def test_batch_edge_cases():
    refs = ["", "abc", "", "ខ្មែរ"]
    hyps = ["", "", "xyz", "ខ្មែរ"]
    np.testing.assert_array_equal(levenshtein_batch(refs, hyps), [0, 3, 3, 0])
    assert levenshtein_batch([], []).size == 0


def test_threading_consistency():
    refs = ["កខគ" * 30] * 64
    hyps = ["កគគ" * 30] * 64
    one = levenshtein_batch(refs, hyps, num_threads=1)
    many = levenshtein_batch(refs, hyps, num_threads=8)
    np.testing.assert_array_equal(one, many)
