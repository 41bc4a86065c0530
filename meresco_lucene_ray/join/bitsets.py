"""Key-bitset join primitives over Ray Data — the Ray-native re-expression of
the reference's cross-core join currency.

Reference semantics being re-expressed:
- ``KeyCollector``: run a query on core X, set bit ``keyValue`` for every
  matching doc (/root/reference/src/org/meresco/lucene/search/join/KeyCollector.java:37-78).
- ``KeyFilter``: filter core Y to docs whose key bit is (or isn't) set
  (/root/reference/src/org/meresco/lucene/queries/KeyFilter.java:46-124).
- ``KeyBits`` AND/OR/NOT algebra (…/join/relational/KeyBits.java:33-111).
- bitset serialization for exportKeys (Utils.java:106-126) → ``np.packbits``.

Ray-Data-first design: the bitset is a numpy bool array indexed by key value,
built with ONE streaming pass over the collecting side (per-batch partial
bitsets OR-merged — a tree reduce, no shuffle), then **broadcast** via
``ray.put`` and applied as a vectorized mask inside ``map_batches`` on the
filtering side — the classic broadcast semi-join.  At 100 TB the bitset for a
numerated key space of 10^9 keys is 125 MB packed — one object-store entry
read zero-copy by every task, never re-shipped per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import strip_meta


@dataclass
class KeyBits:
    """Bitset over a numerated key space with the reference's lazy-NOT
    algebra (KeyBits.java:33-111)."""

    bits: np.ndarray  # bool[size]
    inverted: bool = False

    def materialize(self) -> np.ndarray:
        return ~self.bits if self.inverted else self.bits

    def __and__(self, other: "KeyBits") -> "KeyBits":
        return KeyBits(self.materialize() & other.materialize())

    def __or__(self, other: "KeyBits") -> "KeyBits":
        return KeyBits(self.materialize() | other.materialize())

    def __invert__(self) -> "KeyBits":
        return KeyBits(self.bits, not self.inverted)

    def cardinality(self) -> int:
        return int(self.materialize().sum())

    def pack(self) -> bytes:
        """Serialized form (exportKeys analog, Utils.java:106-126)."""
        return np.packbits(self.materialize()).tobytes()

    @classmethod
    def unpack(cls, buf: bytes, size: int) -> "KeyBits":
        return cls(np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=size).astype(bool))

    def pack_fixed_bitset(self) -> bytes:
        """EXACT Lucene FixedBitSet wire bytes (Utils.java:117-126
        writeFixedBitSet, read back by meresco/lucene/utils.py:46-51):
        big-endian int32 numBits, int32 numWords, then numWords big-endian
        int64 words where bit i of the set is bit (i & 63) — LSB-first —
        of word (i >> 6)."""
        import struct

        bits = self.materialize()
        num_bits = bits.size
        num_words = (num_bits + 63) // 64
        padded = np.zeros(num_words * 64, dtype=bool)
        padded[:num_bits] = bits
        # LSB-first bit packing → little-endian byte view == Java long value
        words = np.packbits(padded, bitorder="little").view("<u8")
        return struct.pack(">ii", num_bits, num_words) + words.byteswap().tobytes()

    @classmethod
    def unpack_fixed_bitset(cls, buf: bytes) -> "KeyBits":
        """Inverse of :meth:`pack_fixed_bitset` (Utils.java:106-115)."""
        import struct

        num_bits, num_words = struct.unpack(">ii", buf[:8])
        words = np.frombuffer(buf[8 : 8 + 8 * num_words], dtype=">u8").astype("<u8")
        bits = np.unpackbits(words.view(np.uint8), bitorder="little", count=num_bits)
        return cls(bits.astype(bool))


def bitset_from_keys(keys: np.ndarray, size: int) -> np.ndarray:
    bs = np.zeros(size, dtype=bool)
    k = np.asarray(keys, dtype=np.int64)
    k = k[(k >= 0) & (k < size)]
    bs[k] = True
    return bs


def _adaptive_partial_row(keys: np.ndarray, size: int) -> pa.Table:
    """One adaptive partial: sparse unique-key array when smaller than the
    packed bitset, else the packed bitset."""
    if keys.size * 64 < size:
        payload, kind = keys.astype("<i8").tobytes(), "sparse"
    else:
        payload, kind = np.packbits(bitset_from_keys(keys, size)).tobytes(), "dense"
    return pa.table(
        {
            "kind": pa.array([kind], type=pa.string()),
            "payload": pa.array([payload], type=pa.large_binary()),
        }
    )


def _fold_partials(size: int, tables) -> tuple[np.ndarray | None, np.ndarray]:
    """OR-fold adaptive partial tables → (dense bool[size] | None, sparse
    keys) — dense stays None while only sparse partials were seen."""
    bs: np.ndarray | None = None
    sparse: list[np.ndarray] = []
    for t in tables:
        if len(t) == 0 or "kind" not in t.column_names:
            continue  # Ray 2.49 zero-row blocks carry an EMPTY schema
        for kind, payload in zip(t["kind"].to_pylist(), t["payload"].to_pylist()):
            if kind == "sparse":
                sparse.append(np.frombuffer(payload, dtype="<i8"))
            else:
                arr = np.unpackbits(
                    np.frombuffer(payload, dtype=np.uint8), count=size
                ).astype(bool)
                bs = arr if bs is None else bs | arr
    keys = (
        np.unique(np.concatenate(sparse))
        if sparse
        else np.empty(0, dtype=np.int64)
    )
    return bs, keys


def _merge_partials(size: int, *tables) -> pa.Table:
    """Tree-reduce combiner: OR-merge a group of adaptive partials into ONE
    adaptive partial (sparse union stays sparse while it is the smaller
    encoding)."""
    bs, keys = _fold_partials(size, tables)
    if bs is None:
        return _adaptive_partial_row(keys, size)
    if keys.size:
        bs[keys] = True
    return pa.table(
        {
            "kind": pa.array(["dense"], type=pa.string()),
            "payload": pa.array([np.packbits(bs).tobytes()], type=pa.large_binary()),
        }
    )


_MERGE_REMOTE = None  # decorated once per process


def keys_of_dataset(ds, key_col: str, size: int, fanin: int | None = None) -> KeyBits:
    """KeyCollector over a Dataset: one streaming pass producing per-batch
    ADAPTIVE partials (the batch's unique keys as a sparse int64 array when
    that is smaller than the packed bitset, else the packed bitset — so a
    10^9-bit key space never ships 125 MB per batch of a few thousand
    distinct keys, the round-1 scale trap), OR-merged by a TREE REDUCE in
    Ray tasks: groups of ``fanin`` partial blocks combine into one partial
    per round, so the driver deserializes at most ``fanin`` payloads after
    O(log_fanin blocks) task rounds — at 10^5+ blocks the former serial
    driver loop over every payload is gone.  The partials stay in the
    object store until their merge task consumes them.

    ``keys_of_dataset.last_driver_payloads`` records how many partial rows
    the final driver fold saw (test pin, mirroring last_dedup_driver_rows)."""
    import os

    import ray

    if fanin is None:
        fanin = int(os.environ.get("MLR_BITSET_FANIN", "64"))
    fanin = max(fanin, 2)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # Ray 2.49 empty-schema block
            keys = np.empty(0, dtype=np.int64)
        else:
            keys = np.unique(
                batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        return _adaptive_partial_row(keys[(keys >= 0) & (keys < size)], size)

    refs = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    global _MERGE_REMOTE
    if _MERGE_REMOTE is None:
        _MERGE_REMOTE = ray.remote(num_cpus=1)(_merge_partials)
    rounds = 0
    while len(refs) > fanin:
        refs = [
            _MERGE_REMOTE.remote(size, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
        rounds += 1
    parts = ray.get(refs)
    keys_of_dataset.last_driver_payloads = sum(len(t) for t in parts)
    keys_of_dataset.last_merge_rounds = rounds
    bs, keys = _fold_partials(size, parts)
    if bs is None:
        bs = bitset_from_keys(keys, size)
    elif keys.size:
        bs[keys] = True
    return KeyBits(bs)


def semi_join_filter(ds, key_col: str, keybits: KeyBits):
    """KeyFilter over a Dataset: broadcast the bitset once (ray.put), apply a
    vectorized mask per batch.  ``inverted`` gives the exclude-filter
    (MUST_NOT) semantics of MultiLucene.java:235-252.

    TASK pool, not actors: the packed bitset is one object-store entry read
    zero-copy per worker and unpacked once per process (cached_stage) — an
    actor pool paid ~1s spin-up per pipeline execution for the same state."""
    import ray

    from ..functions.hashing import cached_stage

    ref = ray.put(np.packbits(keybits.materialize()).tobytes())
    size = keybits.bits.size

    class _Unpacked:
        def __init__(self, ref_, size_):
            self.bits = np.unpackbits(
                np.frombuffer(ray.get(ref_), dtype=np.uint8), count=size_
            ).astype(bool)

    def filt(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # incl. Ray 2.49 zero-column empty-schema blocks
            return batch
        bits = cached_stage(_Unpacked, ref, size).bits
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (keys >= 0) & (keys < size)
        mask = np.zeros(len(batch), dtype=bool)
        mask[ok] = bits[keys[ok]]
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow")


def broadcast_lookup_join(ds, key_col: str, mapping, out_col: str, default=None):
    """Join-sort support (J6): broadcast a small ``key → value`` map once and
    attach the mapped column per batch (JoinSortCollector analog,
    /root/reference/src/org/meresco/lucene/search/JoinSortCollector.java:53-252 —
    there: resultDoc→key→otherDoc→sortValue chase; here: one vectorized
    searchsorted against broadcast key-sorted arrays — no per-row Python).

    ``mapping`` is either a ``(keys, values)`` pair of parallel arrays
    (numpy / pyarrow — preferred: no Python dict is ever built, ~100 B/key
    cheaper on the driver) or a plain dict (convenience for small maps)."""
    import ray

    if isinstance(mapping, dict):
        sorted_keys = np.array(sorted(mapping), dtype=np.int64)
        sorted_vals = np.array([mapping[k] for k in sorted_keys.tolist()])
    else:
        k, v = mapping
        keys_np = np.asarray(
            k.to_numpy(zero_copy_only=False) if hasattr(k, "to_numpy") else k,
            dtype=np.int64,
        )
        vals_np = np.asarray(
            v.to_numpy(zero_copy_only=False) if hasattr(v, "to_numpy") else v
        )
        order = np.argsort(keys_np, kind="stable")
        sorted_keys, sorted_vals = keys_np[order], vals_np[order]
    ref = ray.put((sorted_keys, sorted_vals))

    class Attach:
        def __init__(self):
            keys, vals = ray.get(ref)
            self.keys = keys
            self.vals = pa.array(vals)  # Arrow once per actor; take() below

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:  # Ray 2.49 empty-schema block
                return batch.append_column(out_col, pa.array([], type=self.vals.type))
            keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(self.keys, keys), max(self.keys.size - 1, 0))
            ok = (
                self.keys[pos] == keys
                if self.keys.size
                else np.zeros(len(batch), dtype=bool)
            )
            # null-masked take instead of a Python object array per batch
            idx = pa.array(pos, mask=~ok, type=pa.int64())
            col = pc.take(self.vals, idx) if self.keys.size else pa.nulls(len(batch))
            if default is not None:
                # default applies to UNMATCHED keys only — a matched key
                # whose mapping value is null keeps its null (fill_null
                # could not tell the two apart, and raises on the null-type
                # column an empty/all-null mapping produces)
                if pa.types.is_null(col.type):
                    col = pa.array([default] * len(batch))
                else:
                    col = pc.if_else(
                        pa.array(ok), col, pa.scalar(default, type=col.type)
                    )
            return strip_meta(batch).append_column(out_col, col)

    return ds.map_batches(Attach, batch_format="pyarrow", concurrency=(1, 8))
