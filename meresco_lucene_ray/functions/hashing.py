"""Vectorized deterministic hashing primitives — zero Python per token.

The dedup family (MinHash/SimHash/fingerprint) hashes every token or shingle
of every document; a per-byte Python loop there IS the pipeline's hot loop at
100 TB.  These kernels keep the round-1 frozen hash specs bit-identical
(``fnv1a_arrow`` == ``textstats.hash_str``) while doing all byte work in
numpy over Arrow buffers:

- ``fnv1a_arrow``: FNV-1a 64 of every string in a pyarrow StringArray.
  Strings are length-sorted so each byte-position pass touches a contiguous
  prefix; total work is O(total_bytes) of vectorized u64 ops.
- ``mersenne_mulmod``: exact (a*b) mod (2^61-1) on uint64 arrays via 32-bit
  limb decomposition (2^64 ≡ 8, 2^61 ≡ 1 mod p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
MERSENNE61 = (1 << 61) - 1
_M = np.uint64(MERSENNE61)


def _string_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte offsets int64, flat uint8 data) for a (large_)string/binary array."""
    off_dtype = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    offs = offs.astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return offs, data


def fnv1a_arrow(arr) -> np.ndarray:
    """FNV-1a 64-bit of each utf8 string — bit-identical to
    ``textstats.hash_str`` (the frozen round-1 spec), vectorized by byte
    position over length-sorted strings.  Nulls hash as empty strings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    n = len(arr)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    offs, data = _string_view(arr)
    starts = offs[:-1]
    lens = np.diff(offs)
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return out
    order = np.argsort(-lens, kind="stable")  # longest first → active prefix
    s_starts = starts[order]
    s_lens = lens[order]
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    # number of strings with length > i, for each byte position i:
    # -s_lens is ascending; count of s_lens > i = count of -s_lens < -i
    active = np.searchsorted(-s_lens, -np.arange(max_len, dtype=np.int64), side="left")
    for i in range(max_len):
        m = active[i]
        if m == 0:
            break
        b = data[s_starts[:m] + i].astype(np.uint64)
        h[:m] = (h[:m] ^ b) * FNV_PRIME  # uint64 wraps mod 2^64, like hash_str
    out[order] = h
    return out


def mersenne_reduce(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for ANY uint64 array — exact, shift/add only (no
    division): x = a·2^61 + b ≡ a + b (mod p); a < 8 so ONE round + one
    conditional subtract suffices (a + b < 2p)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    return mersenne_reduce_inplace(x)


def mersenne_reduce_inplace(x: np.ndarray) -> np.ndarray:
    """In-place mersenne_reduce for an OWNED uint64 array (minimal temps —
    this runs over every (perm × shingle) cell of the MinHash hot loop)."""
    hi = x >> np.uint64(61)  # < 8
    x &= _M
    x += hi  # < 2p ⇒ one conditional subtract finishes the reduction
    np.subtract(x, _M, out=x, where=x >= _M)
    return x


def mersenne_mulmod(a: np.ndarray, b) -> np.ndarray:
    """(a * b) mod (2^61 - 1), exact, on uint64 arrays with a, b < 2^61."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    u32 = np.uint64(0xFFFFFFFF)
    ah, al = a >> np.uint64(32), a & u32
    bh, bl = b >> np.uint64(32), b & u32
    hh = ah * bh  # < 2^58; contributes hh * 2^64 ≡ hh * 8
    mid = ah * bl + al * bh  # < 2^62, fits
    ll = al * bl  # < 2^64, fits
    r = hh << np.uint64(3)
    mid = (mid >> np.uint64(61)) + (mid & _M)  # < 2^61 + 2
    # mid * 2^32 mod p: mid = xh*2^29 + xl → xh*2^61 + xl*2^32 ≡ xh + xl*2^32
    r = r + (mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
    r = r + (ll >> np.uint64(61)) + (ll & _M)
    r = (r >> np.uint64(61)) + (r & _M)
    return np.where(r >= _M, r - _M, r)


def mersenne_addmod(a: np.ndarray, b) -> np.ndarray:
    """(a + b) mod (2^61 - 1) for uint64 arrays with a, b < 2^61."""
    r = np.asarray(a, dtype=np.uint64) + np.asarray(b, dtype=np.uint64)
    r = (r >> np.uint64(61)) + (r & _M)
    return np.where(r >= _M, r - _M, r)


def list_col_to_matrix(col, dtype=None):
    """``list<float>`` column → (n, dim) numpy matrix, zero-copy when the
    lists are rectangular and null-free (the embedding-column layout): the
    flattened values buffer IS the matrix.  Falls back to ``to_pylist`` for
    ragged input."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if col.null_count == 0 and (widths == widths[0]).all():
        # flatten() is slice-aware: it returns exactly this array's values
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(n, int(widths[0]))
        return mat.astype(dtype) if dtype is not None and mat.dtype != dtype else mat
    arr = col.to_pylist()
    return np.asarray(arr, dtype=dtype or np.float64)


def strip_meta(batch):
    """Drop schema-level metadata (zero-copy) from a pyarrow Table.

    Parquet files written by pandas carry a ``b'pandas'`` schema-metadata
    entry; a pyarrow Schema with ANY metadata is unhashable (its ``__hash__``
    hashes the metadata dict), which defeats Ray Data's block-schema
    deduplication and logs a "Failed to hash the schemas" warning per block.
    Apply at the head of any map stage that returns a batch-derived table."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


_STAGE_CACHE: dict = {}


def cached_stage(cls, *args):
    """Per-worker-process stage cache for TASK-pool map_batches.

    Stages whose state is trivial to rebuild (rng permutation params,
    stopword tables) run faster as tasks on the shared worker pool than as
    an actor pool: actor pools pay ~1s spin-up per pipeline execution, which
    dominates short stages.  The instance is built once per (cls, args) per
    worker process and reused across tasks.

    A class may set ``CACHE_SLOTS = n`` to bound ITS entries separately from
    the global FIFO: stages keyed on a per-query ObjectRef (broadcast
    payloads) can never be reused by a later query, and each holds zero-copy
    views that PIN the plasma payload — 32 dead ≤256 MB payloads per worker
    is real memory; 2 slots (current + draining) is the right bound."""
    key = (cls, args)
    st = _STAGE_CACHE.get(key)
    if st is None:
        slots = getattr(cls, "CACHE_SLOTS", None)
        if slots is not None:
            same = [k for k in _STAGE_CACHE if k[0] is cls]
            for k in same[: max(0, len(same) - slots + 1)]:
                _STAGE_CACHE.pop(k)
        if len(_STAGE_CACHE) >= 32:  # bound worker-process memory (FIFO)
            _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        st = _STAGE_CACHE[key] = cls(*args)
    return st


def ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated — the ragged index helper."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
