"""Off-driver tombstone application with a bloom pre-filter.

The reference applies deletes through Lucene's per-segment liveDocs bitsets
(updateDocument/deleteDocument, Lucene.java:166-181); this engine keeps an
append-only ``tombstones.parquet`` of (``__id__``, ``before_shard``) pairs.

Scale contract: the DRIVER never materializes the tombstone set.  It hands
query actors only the parquet path; each actor loads the set once in
``__init__`` (:class:`TombstoneSet`) and every segment load runs a two-hash
bloom pre-filter over vectorized FNV-1a id hashes — only bloom-positive ids
(a vanishing fraction when tombstones are sparse) do the exact Arrow
``index_in`` membership probe.  Driver memory is O(1) at any tombstone
count; per-segment cost is O(n_docs) numpy bit ops + O(bloom hits) exact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import fnv1a_arrow

# ~16 bits per key with k=2 hashes → false-positive rate ≈ (2/16)^2 < 2%
_BITS_PER_KEY = 16
_MIN_BITS = 1 << 13


def _bloom_positions(h: np.ndarray, m_mask: int) -> tuple[np.ndarray, np.ndarray]:
    """Two derived bit positions per 64-bit hash (Kirsch-Mitzenmacher:
    g_i = h1 + i*h2, here with a fixed odd multiplier mix for h2)."""
    h1 = h & np.uint64(m_mask)
    h2 = ((h >> np.uint64(33)) * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(m_mask)
    return h1, h2


class TombstoneSet:
    """Tombstone membership set, loaded from ``tombstones.parquet`` in the
    consuming TASK/ACTOR (never on the driver).

    ``deleted_mask(ids, shard)`` → boolean numpy mask (or None when no doc
    in ``ids`` is tombstoned past ``shard``), fully vectorized.
    """

    def __init__(self, path: str):
        t = pq.read_table(path)
        # collapse the append-only log to max(before_shard) per id
        agg = (
            t.group_by("__id__").aggregate([("before_shard", "max")])
            if len(t)
            else t
        )
        self.ids: pa.Array = (
            agg["__id__"].combine_chunks() if len(agg) else pa.array([], type=pa.string())
        )
        self.before: np.ndarray = (
            agg["before_shard_max"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(agg)
            else np.empty(0, dtype=np.int64)
        )
        n = len(self.ids)
        m = max(_MIN_BITS, 1 << int(np.ceil(np.log2(max(n, 1) * _BITS_PER_KEY))))
        self._m_mask = m - 1
        # bit-packed filter: m/8 bytes (~2 B/key) per actor
        self.bits = np.zeros(m >> 3, dtype=np.uint8)
        if n:
            h = fnv1a_arrow(self.ids)
            for p in _bloom_positions(h, self._m_mask):
                np.bitwise_or.at(
                    self.bits, (p >> np.uint64(3)).astype(np.int64),
                    np.left_shift(np.uint8(1), (p & np.uint64(7)).astype(np.uint8)),
                )
        # cheapest upper bound usable by callers for gating
        self.max_before = int(self.before.max()) if n else -1

    def __len__(self) -> int:
        return len(self.ids)

    def deleted_mask(self, ids, shard: int) -> np.ndarray | None:
        """Mask of docs in ``ids`` (Arrow string array/chunked) that are
        tombstoned with ``before_shard > shard``; None when none are."""
        if not len(self.ids) or self.max_before <= shard:
            return None
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = fnv1a_arrow(ids)
        p1, p2 = _bloom_positions(h, self._m_mask)
        maybe = np.ones(len(ids), dtype=bool)
        for p in (p1, p2):
            maybe &= (
                self.bits[(p >> np.uint64(3)).astype(np.int64)]
                >> (p & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1) != 0
        if not maybe.any():
            return None
        cand_idx = np.flatnonzero(maybe)
        pos = pc.index_in(ids.take(pa.array(cand_idx)), value_set=self.ids)
        pos_np = pos.to_numpy(zero_copy_only=False)
        found = pos_np == pos_np  # NaN-safe "is not null"
        dead_local = np.zeros(cand_idx.size, dtype=bool)
        fi = pos_np[found].astype(np.int64)
        dead_local[found] = self.before[fi] > shard
        if not dead_local.any():
            return None
        dead = np.zeros(len(ids), dtype=bool)
        dead[cand_idx[dead_local]] = True
        return dead

    def before_shard_of(self, ids) -> np.ndarray:
        """Exact max-before_shard per id (-1 when not tombstoned) — the
        vectorized replacement for the legacy dict lookup (merge path)."""
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = np.full(len(ids), -1, dtype=np.int64)
        if not len(self.ids):
            return out
        pos = pc.index_in(ids, value_set=self.ids)
        pos_np = pos.to_numpy(zero_copy_only=False)
        found = pos_np == pos_np
        out[found] = self.before[pos_np[found].astype(np.int64)]
        return out


def tombstone_path(index_dir: str) -> str | None:
    """The path handed to actors — the driver's only tombstone touchpoint."""
    p = os.path.join(index_dir, "tombstones.parquet")
    return p if os.path.exists(p) else None
