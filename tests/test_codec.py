import numpy as np

from meresco_lucene_ray.index.codec import (
    BLOCK_SIZE,
    decode_positions,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_position_lists,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(5):
        vals = rng.integers(0, 2**50, size=10_000, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_delta_roundtrip():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_postings_roundtrip_and_blockmax():
    rng = np.random.default_rng(3)
    docids = np.unique(rng.integers(0, 1_000_000, size=1000, dtype=np.uint64))
    tfs = rng.integers(1, 50, size=docids.size, dtype=np.uint64)
    db, tb, blk_last, blk_maxtf = encode_postings(docids, tfs)
    d2, t2 = decode_postings(db, tb)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    nblocks = (docids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert blk_last.size == nblocks == blk_maxtf.size
    assert blk_last[-1] == docids[-1]
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, docids.size)
        assert blk_maxtf[bi] == tfs[lo:hi].max()
        assert blk_last[bi] == docids[hi - 1]


def test_positions_roundtrip():
    lists = [[0, 3, 9], [], [5], list(range(0, 500, 7))]
    buf, offs = encode_position_lists(lists)
    for i, expect in enumerate(lists):
        got = decode_positions(buf, int(offs[i]), int(offs[i + 1]))
        assert got.tolist() == expect
