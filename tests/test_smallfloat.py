"""float1120 round-trip pins mirroring UtilsTest.testInt1120
(/root/reference/test/org/meresco/lucene/UtilsTest.java:76-99)."""

import numpy as np

from meresco_lucene_ray.join.smallfloat import (
    float_to_int1120,
    int1120_to_float,
    quantize_scores_1120,
)


def roundtrip(f):
    return float(int1120_to_float(float_to_int1120(np.float32(f)))[0])


def test_zero_and_negative():
    assert roundtrip(0.0) == 0.0
    assert roundtrip(-1.0) == 0.0


def test_smallest_float():
    smallest = np.int32((1 << (23 - 11)) + ((127 - 20) << 23)).view(np.float32)
    assert abs(float(smallest) - 9.5414e-7) < 1e-10
    assert roundtrip(smallest) == float(smallest)
    # anything positive but smaller maps UP to the smallest code point
    smaller = np.int32(np.int32(smallest.view(np.int32)) - 1).view(np.float32)
    assert roundtrip(smaller) == float(smallest)


def test_biggest_float():
    biggest = np.int32((0xFFFF << (23 - 11)) + ((127 - 20) << 23)).view(np.float32)
    assert float(biggest) == 4095.0
    assert roundtrip(biggest) == 4095.0
    bigger = np.int32(np.int32(biggest.view(np.int32)) + 1).view(np.float32)
    assert roundtrip(bigger) == 4095.0


def test_pi():
    assert roundtrip(np.float32(np.pi)) == 3.140625


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(0, 4200, 100),
            rng.uniform(0, 1e-6, 50),
            [-3.5, 0.0, 4095.0, 1e9],
        ]
    ).astype(np.float32)
    got = quantize_scores_1120(vals)
    exp = np.array([roundtrip(v) for v in vals], dtype=np.float64)
    assert np.array_equal(got, exp)
    # codes are 16-bit
    codes = float_to_int1120(vals)
    assert codes.dtype == np.uint16


def test_monotone_on_positive_range():
    # quantization must preserve ranking of positive scores (J5 blending)
    xs = np.sort(np.random.default_rng(11).uniform(1e-6, 4095, 1000).astype(np.float32))
    q = quantize_scores_1120(xs)
    assert (np.diff(q) >= 0).all()
