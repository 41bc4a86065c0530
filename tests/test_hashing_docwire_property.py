"""Property tests: FNV hot path on sliced arrays + Lucene numeric/geo wire (S2).

  * ``fnv1a_arrow`` ≡ the scalar ``hash_str`` spec on random unicode
    strings — including NULLs (hash as ""), large_string arrays, and
    SLICED arrays (arr.offset ≠ 0): the ``_string_view`` offset window is
    the classic zero-copy foot-gun, exercised here explicitly because Ray
    map tasks routinely see sliced record batches;
  * ``double_to_sortable_long`` preserves strict numeric order on random
    doubles (negatives, ±0, subnormals, infinities) — the sortable-long
    invariant the range-query wire parse relies on (NumericUtils);
  * LatLonPoint lat/lon quantizers: decode error ≤ one quantum, and
    encode∘decode is the identity on quantized points (GeoEncodingUtils).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.docwire import (
    decode_latitude,
    decode_longitude,
    double_to_sortable_long,
    encode_latitude,
    encode_longitude,
)
from meresco_lucene_ray.functions.hashing import fnv1a_arrow
from meresco_lucene_ray.functions.textstats import hash_str

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_fnv1a_arrow_matches_scalar_on_sliced_arrays(data):
    texts = data.draw(
        st.lists(st.one_of(st.none(), _TEXT), min_size=1, max_size=12), label="texts"
    )
    typ = pa.large_string() if data.draw(st.booleans(), label="large") else pa.string()
    arr = pa.array(texts, type=typ)
    lo = data.draw(st.integers(0, len(texts) - 1), label="lo")
    hi = data.draw(st.integers(lo, len(texts)), label="hi")
    window = arr.slice(lo, hi - lo)
    got = fnv1a_arrow(window)
    want = np.array(
        [hash_str(t if t is not None else "") for t in texts[lo:hi]],
        dtype=np.uint64,
    )
    assert (got == want).all(), texts[lo:hi]


_DOUBLE = st.floats(allow_nan=False)  # infinities allowed


@settings(max_examples=200, deadline=None)
@given(x=_DOUBLE, y=_DOUBLE)
def test_sortable_long_preserves_order(x, y):
    sx, sy = double_to_sortable_long(x), double_to_sortable_long(y)
    if x < y:
        assert sx < sy
    elif x > y:
        assert sx > sy
    # x == y covers 0.0 == -0.0, whose bit patterns differ: sortable-long
    # order must still agree with numeric order against any third value,
    # which the strict branches above pin via other examples


@settings(max_examples=150, deadline=None)
@given(
    lat=st.floats(min_value=-90.0, max_value=90.0 - 1e-9),
    lon=st.floats(min_value=-180.0, max_value=180.0 - 1e-9),
)
def test_latlon_quantizer_error_and_idempotence(lat, lon):
    qlat = 90.0 / (1 << 31)
    qlon = 180.0 / (1 << 31)
    elat, elon = encode_latitude(lat), encode_longitude(lon)
    assert abs(decode_latitude(elat) - lat) <= qlat
    assert abs(decode_longitude(elon) - lon) <= qlon
    # encoding a decoded (quantized) point is the identity
    assert encode_latitude(decode_latitude(elat)) == elat
    assert encode_longitude(decode_longitude(elon)) == elon
