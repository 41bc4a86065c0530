"""Property-based tests (hypothesis) for the codec-level invariants the
whole engine leans on: posting-list varint/delta round trip with block-max
metadata, position-list round trip, bitset pack/unpack + algebra,
float1120 quantization monotonicity, tokenizer/stage determinism."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index.codec import (
    BLOCK_SIZE,
    decode_positions,
    decode_postings,
    encode_position_lists,
    encode_postings,
    varint_decode,
    varint_encode,
)
from meresco_lucene_ray.join.bitsets import KeyBits, bitset_from_keys
from meresco_lucene_ray.join.smallfloat import float_to_int1120, int1120_to_float


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_varint_round_trip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**31 - 1),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=4 * BLOCK_SIZE + 7,
        unique_by=lambda t: t[0],
    )
)
def test_postings_round_trip_and_block_max(pairs):
    pairs.sort()
    docids = np.asarray([p[0] for p in pairs], dtype=np.uint64)
    tfs = np.asarray([p[1] for p in pairs], dtype=np.uint64)
    docs_buf, tfs_buf, blk_last, blk_maxtf = encode_postings(docids, tfs)
    d2, t2 = decode_postings(docs_buf, tfs_buf)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    # block metadata invariants: last docid per block and max tf per block
    n = docids.size
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n) - 1
    assert np.array_equal(blk_last, docids[ends].astype(np.int64))
    assert np.array_equal(blk_maxtf, np.maximum.reduceat(tfs, starts).astype(np.int32))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**20), min_size=0, max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_position_lists_round_trip(lists):
    lists = [sorted(x) for x in lists]
    buf, bounds = encode_position_lists([np.asarray(x, dtype=np.int64) for x in lists])
    assert bounds.size == len(lists) + 1
    for i, x in enumerate(lists):
        got = decode_positions(buf, int(bounds[i]), int(bounds[i + 1]))
        assert got.tolist() == x


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.data(),
)
def test_keybits_pack_unpack_and_algebra(size, data):
    a_keys = data.draw(st.lists(st.integers(0, size - 1), max_size=size))
    b_keys = data.draw(st.lists(st.integers(0, size - 1), max_size=size))
    a = KeyBits(bitset_from_keys(np.asarray(a_keys, dtype=np.int64), size))
    b = KeyBits(bitset_from_keys(np.asarray(b_keys, dtype=np.int64), size))
    assert np.array_equal(
        KeyBits.unpack(a.pack(), size).materialize(), a.materialize()
    )
    # De Morgan over the lazy-inverted representation
    lhs = (~(a | b)).materialize()
    rhs = ((~a) & (~b)).materialize()
    assert np.array_equal(lhs, rhs)
    assert (a & b).cardinality() == int((a.materialize() & b.materialize()).sum())


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=0.0, max_value=1e30, allow_nan=False))
def test_float1120_round_trip_stability(x):
    b = np.asarray(float_to_int1120(x)).item()
    y = np.asarray(int1120_to_float(b)).item()
    # quantization is idempotent and order-preserving at the bucket level
    assert np.asarray(float_to_int1120(y)).item() == b
    assert y >= 0.0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1e6, allow_nan=False), min_size=2, max_size=50))
def test_float1120_monotone(xs):
    xs = sorted(xs)
    bs = [np.asarray(float_to_int1120(x)).item() for x in xs]
    assert bs == sorted(bs)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_tokenizer_split_invariance(texts):
    """arrow_tokens over a batch equals per-row tokenization — the batch
    boundary can never change the token stream."""
    from meresco_lucene_ray.analysis import arrow_tokens, tokenize

    col = pa.array(texts, type=pa.string())
    codes, doc_idx, dic, dl = arrow_tokens(col)
    toks = dic.take(pa.array(codes, type=pa.int32())).to_pylist()
    flat_expected = []
    for t in texts:
        flat_expected.extend(tokenize(t))
    assert toks == flat_expected
    assert dl.tolist() == [len(tokenize(t)) for t in texts]
