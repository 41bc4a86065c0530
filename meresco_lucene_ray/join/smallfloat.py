"""Exact float1120 score quantization — 11-bit mantissa, zeroExp=20.

Ports ``Utils.floatToInt1120`` / ``Utils.int1120ToFloat``
(/root/reference/src/org/meresco/lucene/Utils.java:138-159, itself modelled
after Lucene's SmallFloat) as vectorized numpy bit surgery, so rank-query
score arrays (J5) round-trip through the SAME 16-bit code points as the
reference — bit-identical blending, not the IEEE-float16 approximation the
round-1/2 engine used.

Representable range 9.5414e-7 .. 4095.0; round-trip pinned by
``tests/test_smallfloat.py`` mirroring ``UtilsTest.testInt1120``.
"""

from __future__ import annotations

import numpy as np

_FZERO = (127 - 20) << 11  # exponent bias re-centered on zeroExp=20
_SHIFT = 23 - 11  # drop 12 low mantissa bits: 23-bit → 11-bit mantissa


def float_to_int1120(f: np.ndarray | float) -> np.ndarray:
    """Quantize float32 score(s) to 16-bit code points (0..0xffff)."""
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32)
    smallfloat = bits >> _SHIFT  # arithmetic shift, as in Java
    out = (smallfloat - _FZERO).astype(np.int32)
    # underflow: 0 for <= +0.0, else the smallest nonzero code point 1
    under = smallfloat <= _FZERO
    out[under] = np.where(bits[under] <= 0, 0, 1)
    # overflow: clamp to the largest code point
    out[smallfloat > _FZERO + 0xFFFF] = 0xFFFF
    return out.astype(np.uint16)


def int1120_to_float(b: np.ndarray | int) -> np.ndarray:
    """Decode 16-bit code point(s) back to float32."""
    code = np.atleast_1d(np.asarray(b)).astype(np.int32) & 0xFFFF
    bits = (code << _SHIFT) + ((127 - 20) << 23)
    out = bits.view(np.float32).copy()
    out[code == 0] = 0.0
    return out


def quantize_scores_1120(arr: np.ndarray) -> np.ndarray:
    """Round-trip a float array through the 1120 encoding (float64 out),
    exactly what the reference does to rank-query max-score payloads before
    shipping them between cores (MultiLucene.java:195-233 via
    KeySuperCollector score serialization)."""
    return int1120_to_float(float_to_int1120(arr)).astype(np.float64)
