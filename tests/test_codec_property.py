"""Property tests: posting-list codec + float1120 quantization (P4/J5).

test_codec.py pins fixed examples; hypothesis here drives the codec over
adversarial distributions — varint values across every byte-length band up
to 2^64-1, posting lists spanning multiple 128-entry blocks with gaps of 0
(duplicate docids never occur in real postings, but the codec contract is
pure round-trip), term partitions with empty terms, position lists that are
empty or single-element — asserting:

  * varint encode/decode is a bijection, and the with-sizes variant's spans
    decode value-by-value (the segment encoder's slicing contract);
  * encode_postings/decode_postings round-trip, with block metadata (last
    docid, max tf per 128-block) matching a numpy recomputation;
  * encode_segment_postings over a random term partition yields, for EVERY
    term, byte-identical buffers to the single-term encode_postings, and
    its per-block byte offsets decode each block independently;
  * position-list encode/decode round-trips per posting;
  * float1120: exhaustive code-point idempotence (all 65536), order
    preservation, and truncation error < 2^-10 relative on the
    representable range (Utils.java:138-159 parity).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index.codec import (
    BLOCK_SIZE,
    decode_positions,
    decode_postings,
    encode_position_lists,
    encode_postings,
    encode_segment_postings,
    varint_decode,
    varint_encode,
    varint_encode_with_sizes,
)
from meresco_lucene_ray.join.smallfloat import (
    float_to_int1120,
    int1120_to_float,
)

# values biased to cover every varint byte-length band
_VARINT_VAL = st.one_of(
    st.integers(min_value=0, max_value=2**7),
    st.integers(min_value=0, max_value=2**14),
    st.integers(min_value=0, max_value=2**28),
    st.integers(min_value=0, max_value=2**64 - 1),
)


@settings(max_examples=80, deadline=None)
@given(vals=st.lists(_VARINT_VAL, max_size=400))
def test_varint_roundtrip_and_spans(vals):
    v = np.array(vals, dtype=np.uint64)
    buf, sizes = varint_encode_with_sizes(v)
    assert len(buf) == int(sizes.sum())
    assert varint_encode(v) == buf
    got = varint_decode(buf)
    assert got.dtype == np.uint64 and (got == v).all()
    offs = np.concatenate(([0], np.cumsum(sizes)))
    for i in np.random.default_rng(0).choice(len(v), size=min(8, len(v)), replace=False) if len(v) else []:
        one = varint_decode(buf[offs[i] : offs[i + 1]])
        assert one.size == 1 and one[0] == v[i]


_POSTINGS = st.lists(
    st.integers(min_value=0, max_value=1_000_000), min_size=0, max_size=3 * BLOCK_SIZE + 5,
    unique=True,
).map(sorted)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_postings_roundtrip_and_block_meta(data):
    docids = np.array(data.draw(_POSTINGS, label="docids"), dtype=np.uint64)
    tfs = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=2**20),
                min_size=len(docids),
                max_size=len(docids),
            ),
            label="tfs",
        ),
        dtype=np.uint64,
    )
    docs_buf, tfs_buf, last, maxtf = encode_postings(docids, tfs)
    d2, t2 = decode_postings(docs_buf, tfs_buf)
    assert (d2 == docids).all() and (t2 == tfs).all()
    n = docids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert last.size == maxtf.size == nblocks
    for b in range(nblocks):
        sl = slice(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n))
        assert last[b] == docids[sl][-1]
        assert maxtf[b] == tfs[sl].max()


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_segment_encode_matches_per_term(data):
    # a random concatenation of per-term posting lists (terms may be empty)
    nterms = data.draw(st.integers(min_value=1, max_value=6), label="nterms")
    per_term = [
        np.array(data.draw(_POSTINGS, label=f"term{t}"), dtype=np.uint64)
        for t in range(nterms)
    ]
    docids = np.concatenate(per_term) if per_term else np.zeros(0, np.uint64)
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31), label="seed"))
    tfs = rng.integers(1, 50, size=docids.size).astype(np.uint64)
    lens = np.array([p.size for p in per_term])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    docs_col, tfs_col, blk_last, blk_maxtf, blk_doc_off, blk_tf_off, _ = (
        encode_segment_postings(starts, docids, tfs)
    )
    bounds = np.concatenate((starts, [docids.size]))
    for t in range(nterms):
        td, tt = per_term[t], tfs[bounds[t] : bounds[t + 1]]
        db, tb, last, maxtf = encode_postings(td, tt)
        assert docs_col[t].as_py() == db, t
        assert tfs_col[t].as_py() == tb, t
        assert blk_last[t].as_py() == last.tolist(), t
        assert blk_maxtf[t].as_py() == maxtf.tolist(), t
        # per-block byte offsets decode each block independently
        doffs = blk_doc_off[t].as_py()
        assert doffs[-1] == len(db)
        for b in range(len(doffs) - 1):
            blk = varint_decode(db[doffs[b] : doffs[b + 1]])
            abs_blk = np.cumsum(blk, dtype=np.uint64)
            sl = td[b * BLOCK_SIZE : min((b + 1) * BLOCK_SIZE, td.size)]
            assert (abs_blk == sl).all(), (t, b)


@settings(max_examples=50, deadline=None)
@given(
    plists=st.lists(
        st.lists(st.integers(min_value=0, max_value=100_000), max_size=20, unique=True).map(
            sorted
        ),
        max_size=12,
    )
)
def test_position_lists_roundtrip(plists):
    buf, offs = encode_position_lists([np.array(p, dtype=np.int64) for p in plists])
    assert offs.size == len(plists) + 1
    for i, p in enumerate(plists):
        got = decode_positions(buf, int(offs[i]), int(offs[i + 1]))
        assert got.tolist() == p, i


def test_float1120_codepoint_idempotence_exhaustive():
    codes = np.arange(0x10000, dtype=np.uint16)
    rt = float_to_int1120(int1120_to_float(codes))
    assert (rt == codes).all()


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(min_value=0.0, max_value=4095.0, allow_nan=False),
    y=st.floats(min_value=0.0, max_value=4095.0, allow_nan=False),
)
def test_float1120_order_and_truncation(x, y):
    cx, cy = int(float_to_int1120(x)[0]), int(float_to_int1120(y)[0])
    if np.float32(x) <= np.float32(y):
        assert cx <= cy
    rt = float(int1120_to_float(np.uint16(cx))[0])
    if x >= 9.5414e-7:  # representable: mantissa truncation only
        assert rt <= np.float32(x)
        assert np.float32(x) - rt <= np.float32(x) * 2**-10
    elif np.float32(x) > 0:  # the engine quantizes the float32 value
        # below-range positives round UP to the smallest nonzero code
        # (Utils.java underflow rule), never to zero
        assert cx == 1
    else:
        assert cx == 0


@settings(max_examples=50, deadline=None)
@given(x=st.floats(min_value=-4095.0, max_value=0.0, allow_nan=False))
def test_float1120_negative_maps_to_zero(x):
    assert int(float_to_int1120(x)[0]) == 0
    assert float(int1120_to_float(np.uint16(0))[0]) == 0.0
