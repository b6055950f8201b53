"""Native C++ edit-distance kernel vs pure-Python DP."""
import numpy as np
import pytest

from dsml_thesis_tpu.metrics.lipread import edit_distance
from dsml_thesis_tpu.metrics.native import _load, edit_distance_batch


def test_native_builds_and_matches_python():
    if _load() is None:
        pytest.skip("native toolchain unavailable")
    rs = np.random.RandomState(0)
    refs, hyps = [], []
    for _ in range(20):
        la, lb = rs.randint(0, 30), rs.randint(0, 30)
        refs.append(list(rs.randint(0, 5, la)))
        hyps.append(list(rs.randint(0, 5, lb)))
    out = edit_distance_batch(refs, hyps)
    assert out is not None
    expected = [edit_distance(r, h) for r, h in zip(refs, hyps)]
    np.testing.assert_array_equal(out, expected)


def test_native_string_tokens():
    if _load() is None:
        pytest.skip("native toolchain unavailable")
    out = edit_distance_batch([["the", "cat", "sat"]], [["the", "dog", "sat"]])
    assert out is not None and out[0] == 1
