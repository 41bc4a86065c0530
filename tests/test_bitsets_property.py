"""Property tests: KeyBits algebra + FixedBitSet wire + adaptive partials (J1/S7).

test_bitset_tree_reduce.py pins the distributed tree-reduce path through
Ray; these are the pure-function properties under it, hypothesis-driven:

  * KeyBits AND/OR/NOT (including the lazy-NOT flag) against a Python
    set-algebra oracle over random key sets — random small expression trees;
  * pack/unpack and pack_fixed_bitset/unpack_fixed_bitset round-trips, with
    the FixedBitSet wire bytes ALSO checked against an independent
    bit-by-bit struct encoder (Utils.java:117-126 semantics: big-endian
    numBits/numWords header, big-endian int64 words, bit i LSB-first within
    word i>>6) — round-trip alone can't catch a mirrored bit order;
  * _merge_partials over random batch partitions of a key set, mixing
    sparse and dense encodings and zero-schema tables (the Ray 2.49
    empty-block shape), in random tree groupings → always the exact union.
"""

import struct

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.join.bitsets import (
    KeyBits,
    _adaptive_partial_row,
    _merge_partials,
    bitset_from_keys,
)

_SIZE = st.integers(min_value=1, max_value=200)


def _keys(size):
    return st.lists(st.integers(0, size - 1), max_size=size, unique=True)


def _ref_fixed_bitset_bytes(bits):
    """Independent FixedBitSet encoder: per-bit Python, no numpy packing."""
    num_bits = len(bits)
    num_words = (num_bits + 63) // 64
    words = [0] * num_words
    for i, b in enumerate(bits):
        if b:
            words[i >> 6] |= 1 << (i & 63)
    return struct.pack(">ii", num_bits, num_words) + b"".join(
        struct.pack(">q", w - (1 << 64) if w >= 1 << 63 else w) for w in words
    )


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_keybits_algebra_vs_set_oracle(data):
    size = data.draw(_SIZE, label="size")
    a = set(data.draw(_keys(size), label="a"))
    b = set(data.draw(_keys(size), label="b"))
    ka = KeyBits(bitset_from_keys(np.array(sorted(a)), size))
    kb = KeyBits(bitset_from_keys(np.array(sorted(b)), size))
    universe = set(range(size))
    cases = [
        (ka & kb, a & b),
        (ka | kb, a | b),
        (~ka, universe - a),
        ((~ka) & kb, (universe - a) & b),
        (~(ka | kb), universe - (a | b)),
        (~(~kb), b),  # double lazy-NOT
    ]
    for got, want in cases:
        assert got.cardinality() == len(want)
        assert set(np.flatnonzero(got.materialize()).tolist()) == want


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_wire_roundtrips_and_reference_bytes(data):
    size = data.draw(_SIZE, label="size")
    keys = data.draw(_keys(size), label="keys")
    kb = KeyBits(bitset_from_keys(np.array(sorted(keys)), size))
    if data.draw(st.booleans(), label="invert"):
        kb = ~kb
    bits = kb.materialize()

    assert (KeyBits.unpack(kb.pack(), size).bits == bits).all()

    wire = kb.pack_fixed_bitset()
    assert wire == _ref_fixed_bitset_bytes(bits.tolist())
    assert (KeyBits.unpack_fixed_bitset(wire).bits == bits).all()


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_merge_partials_is_exact_union(data):
    size = data.draw(_SIZE, label="size")
    batches = data.draw(
        st.lists(_keys(size), min_size=1, max_size=6), label="batches"
    )
    parts = []
    for ks in batches:
        arr = np.array(sorted(ks), dtype=np.int64)
        if data.draw(st.booleans(), label="force_dense"):
            # force the dense encoding regardless of the size heuristic
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(["dense"], type=pa.string()),
                        "payload": pa.array(
                            [np.packbits(bitset_from_keys(arr, size)).tobytes()],
                            type=pa.large_binary(),
                        ),
                    }
                )
            )
        else:
            parts.append(_adaptive_partial_row(arr, size))
    if data.draw(st.booleans(), label="zero_schema"):
        parts.insert(
            data.draw(st.integers(0, len(parts)), label="at"), pa.table({})
        )
    # random tree grouping: merge a random prefix, then merge the result
    # with the rest (exercises partial-of-partial)
    cut = data.draw(st.integers(1, len(parts)), label="cut")
    merged_head = _merge_partials(size, *parts[:cut])
    final = _merge_partials(size, merged_head, *parts[cut:])

    want = set().union(*[set(b) for b in batches])
    got_bits, got_keys = (
        final["kind"][0].as_py(),
        final["payload"][0].as_py(),
    )
    if got_bits == "sparse":
        got = set(np.frombuffer(got_keys, dtype="<i8").tolist())
    else:
        got = set(
            np.flatnonzero(
                np.unpackbits(np.frombuffer(got_keys, dtype=np.uint8), count=size)
            ).tolist()
        )
    assert got == want
