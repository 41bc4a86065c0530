"""Posting-list codec: delta + LEB128 varint compression with block-max metadata.

Per the north-star design: docID gaps are delta-encoded then
varint-compressed; every posting list carries per-block skip metadata
(last docid, max tf, min dl) enabling block-max WAND-style pruning and
block skipping during conjunctive evaluation.

All encode/decode paths are numpy-vectorized — no per-value Python loops
over posting entries (loops run over the ≤10 varint byte-rounds instead).

Layout of one encoded posting list (bytes):
    varint(doc_gap_0), varint(doc_gap_1), ...          -> ``docs`` buffer
    varint(tf_0), varint(tf_1), ...                    -> ``tfs`` buffer
block metadata is stored columnar next to the buffers (see build.py):
    block_last_doc: int64[], block_max_tf: int32[], block_offsets: int64[]
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per skip block


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array, returning (buffer, bytes-per-value).

    The sizes array lets callers slice one big buffer into per-term /
    per-posting spans without re-encoding — the segment builder encodes a
    whole segment's postings in O(max_bytes) numpy passes total.

    Fast paths for the dominant distributions: all-single-byte arrays (tf
    columns, dense docid gaps) are one astype — no scatter at all; in the
    general case the first byte is written unmasked and only the small
    multi-byte tail pays fancy-index scatters.
    """
    v = np.asarray(values)
    # dtype-native: int32/uint32 inputs (position streams) encode at half
    # the memory traffic — LEB128 bytes depend only on the VALUE, so the
    # output is identical to the uint64 path (inputs must be non-negative,
    # as before: the old unconditional uint64 cast mangled negatives too)
    if v.dtype == np.int32:
        v = v.view(np.uint32)
    elif v.dtype != np.uint32 and v.dtype != np.uint64:
        v = np.asarray(v, dtype=np.uint64)
    seven = v.dtype.type(7)
    mask7f = v.dtype.type(0x7F)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    big = v >> seven
    if not big.any():
        return v.astype(np.uint8).tobytes(), np.ones(v.size, dtype=np.int64)
    # nbytes fits int8 (≤10 for uint64); the shift loop works IN PLACE on the
    # `big` copy — the former int64 counts + per-round shifted copies were
    # 2+rounds full-width temporaries on the build's hottest kernel
    nbytes8 = np.ones(v.shape, dtype=np.int8)
    shifted = big
    while True:
        mask = shifted > 0
        if not mask.any():
            break
        nbytes8[mask] += 1
        shifted >>= seven
    nbytes = nbytes8.astype(np.int64)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    # byte 0 exists for EVERY value — no mask needed
    out[starts] = (v & mask7f).astype(np.uint8) | (
        (nbytes > 1).astype(np.uint8) << 7
    )
    for k in range(1, maxb):
        mask = nbytes > k
        byte = (v[mask] >> v.dtype.type(7 * k)) & mask7f
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = byte.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized.

    Works in O(max_bytes) numpy passes (≤10 for uint64).
    """
    return varint_encode_with_sizes(values)[0]


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a LEB128 buffer to uint64, vectorized via reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = b < 0x80
    if is_end.all():
        # all-single-byte buffer (tf columns, dense docid gaps — the
        # dominant case): values ARE the bytes; skip the arange/repeat/
        # reduceat machinery (~5 full-width passes) on the query hot path
        return b.astype(np.uint64)
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    idx = np.arange(b.size, dtype=np.int64)
    pos = idx - np.repeat(starts, ends - starts + 1)
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """docids (sorted ascending, unique) -> gaps (first value kept as-is)."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    gaps = np.empty_like(ids)
    gaps[0:1] = ids[0:1]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_postings(docids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes, np.ndarray, np.ndarray]:
    """Encode one term's postings (docids sorted asc); gaps reset at block
    starts so blocks decode independently.

    Returns (docs_buf, tfs_buf, block_last_doc[int64], block_max_tf[int32]).
    """
    docids = np.asarray(docids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = docids.size
    starts = np.arange(0, n, BLOCK_SIZE)
    docs_buf = varint_encode(grouped_delta(docids, starts))
    tfs_buf = varint_encode(tfs)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    last = docids[np.minimum(np.arange(1, nblocks + 1) * BLOCK_SIZE - 1, n - 1)].astype(np.int64)
    maxtf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    return docs_buf, tfs_buf, last, maxtf


def decode_postings(docs_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's postings -> (docids uint64 asc, tfs uint64).

    Gap values reset every BLOCK_SIZE postings (independent blocks)."""
    gaps = varint_decode(docs_buf)
    n = gaps.size
    if n:
        starts = np.arange(0, n, BLOCK_SIZE)
        lengths = np.diff(np.concatenate((starts, [n])))
        cs = np.cumsum(gaps, dtype=np.uint64)
        base = cs[starts] - gaps[starts]
        docids = cs - np.repeat(base, lengths)
    else:
        docids = gaps
    tfs = varint_decode(tfs_buf)
    return docids, tfs


def grouped_delta(values: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Delta-encode within groups of one concatenated sorted array: each
    group's first value stays absolute, the rest become gaps.  int32/uint32
    inputs stay 4-byte (unsigned wraparound across group boundaries is
    overwritten by the absolute group-start values, same as uint64)."""
    v = np.asarray(values)
    if v.dtype == np.int32:
        v = v.view(np.uint32)
    elif v.dtype != np.uint32 and v.dtype != np.uint64:
        v = np.asarray(v, dtype=np.uint64)
    if v.size == 0:
        return v
    g = np.empty_like(v)
    g[0] = v[0]
    np.subtract(v[1:], v[:-1], out=g[1:])
    g[group_starts] = v[group_starts]
    return g


def _spans_to_large_binary(buf: bytes, byte_offsets: np.ndarray) -> "object":
    """Zero-copy LargeBinaryArray: value i = buf[byte_offsets[i]:byte_offsets[i+1]]."""
    import pyarrow as pa

    n = byte_offsets.size - 1
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(byte_offsets.astype(np.int64).tobytes()), pa.py_buffer(buf)],
    )


def _segments_arange(bounds: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For consecutive runs given by ``bounds`` (n+1), return (run_of_item,
    index_within_run) for every item — the repeat/arange idiom."""
    lengths = np.diff(bounds)
    total = int(lengths.sum())
    run_of = np.repeat(np.arange(lengths.size), lengths)
    within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], lengths)
    return run_of, within


def encode_segment_postings(
    term_starts: np.ndarray, docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray | None = None
):
    """Encode ALL of a segment's postings — zero per-term Python loops.

    ``term_starts``: start index of each term's run in the (term, docid)-
    sorted ``docids``/``tfs`` arrays.  ``dls`` (optional): document length of
    each posting's doc, same order — enables the per-block max(tf/dl) score
    bound used by block-max pruned disjunctions.
    Returns arrow arrays: (docs large_binary, tfs large_binary,
    blk_last list<int64>, blk_maxtf list<int32>, blk_doc_off, blk_tf_off,
    blk_maxtfdl list<float64> | None) — one row per term.
    """
    import pyarrow as pa

    docids = np.asarray(docids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    bounds = np.concatenate((term_starts, [docids.size])).astype(np.int64)

    # block structure first: gaps reset at EVERY block start (not just term
    # starts) so any block can be decoded independently — the skip-read path
    n_per_term = np.diff(bounds)
    nblocks = (n_per_term + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_bounds = np.concatenate(([0], np.cumsum(nblocks))).astype(np.int64)
    term_of_blk, blk_within = _segments_arange(blk_bounds)
    starts_g = bounds[:-1][term_of_blk] + blk_within * BLOCK_SIZE
    ends_g = np.minimum(starts_g + BLOCK_SIZE, bounds[1:][term_of_blk])

    gaps = grouped_delta(docids, starts_g.astype(np.int64))
    docs_all, docs_nb = varint_encode_with_sizes(gaps)
    tfs_all, tfs_nb = varint_encode_with_sizes(tfs)
    docs_off = np.concatenate(([0], np.cumsum(docs_nb)))
    tfs_off = np.concatenate(([0], np.cumsum(tfs_nb)))
    docs_col = _spans_to_large_binary(docs_all, docs_off[bounds])
    tfs_col = _spans_to_large_binary(tfs_all, tfs_off[bounds])

    last_doc = docids[ends_g - 1].astype(np.int64) if starts_g.size else np.zeros(0, np.int64)
    maxtf = (
        np.maximum.reduceat(tfs, starts_g).astype(np.int32)
        if starts_g.size
        else np.zeros(0, np.int32)
    )
    blk_last = pa.ListArray.from_arrays(pa.array(blk_bounds.astype(np.int32)), pa.array(last_doc))
    blk_maxtf = pa.ListArray.from_arrays(pa.array(blk_bounds.astype(np.int32)), pa.array(maxtf))
    blk_maxtfdl = None
    if dls is not None:
        ratio = tfs.astype(np.float64) / np.maximum(np.asarray(dls, dtype=np.float64), 1.0)
        maxr = (
            np.maximum.reduceat(ratio, starts_g) if starts_g.size else np.zeros(0, np.float64)
        )
        blk_maxtfdl = pa.ListArray.from_arrays(
            pa.array(blk_bounds.astype(np.int32)), pa.array(maxr)
        )
    # per-block byte offsets (term-relative) enabling partial block decode:
    # nblocks+1 entries per term (final = term buffer length)
    off_bounds = (blk_bounds + np.arange(blk_bounds.size)).astype(np.int64)
    blk_starts_plus_end = np.empty(int(off_bounds[-1]), dtype=np.int64)
    # fill: for each term, its block starts then its end posting index
    term_of_e, within_e = _segments_arange(off_bounds)
    is_end = within_e == (off_bounds[term_of_e + 1] - off_bounds[term_of_e] - 1)
    posting_ix = np.where(
        is_end, bounds[1:][term_of_e], bounds[:-1][term_of_e] + within_e * BLOCK_SIZE
    )
    term_byte_base_d = docs_off[bounds[:-1]][term_of_e]
    term_byte_base_t = tfs_off[bounds[:-1]][term_of_e]
    blk_doc_off = pa.ListArray.from_arrays(
        pa.array(off_bounds.astype(np.int32)),
        pa.array((docs_off[posting_ix] - term_byte_base_d).astype(np.int64)),
    )
    blk_tf_off = pa.ListArray.from_arrays(
        pa.array(off_bounds.astype(np.int32)),
        pa.array((tfs_off[posting_ix] - term_byte_base_t).astype(np.int64)),
    )
    return docs_col, tfs_col, blk_last, blk_maxtf, blk_doc_off, blk_tf_off, blk_maxtfdl


def encode_segment_positions(
    term_posting_bounds: np.ndarray,
    positions_flat: np.ndarray,
    posting_starts: np.ndarray,
):
    """Encode ALL position lists of a segment — zero per-term Python loops.

    ``positions_flat``: concatenation of every posting's position list in
    (term, docid) order; ``posting_starts``: start index of each posting's
    span; ``term_posting_bounds``: posting-index bounds per term (n_terms+1).
    Returns arrow arrays: (pos large_binary, pos_offs list<int64> with
    per-term-relative byte offsets, one entry per posting + 1)."""
    import pyarrow as pa

    gaps = grouped_delta(positions_flat, posting_starts.astype(np.int64))
    buf_all, nb = varint_encode_with_sizes(gaps)
    byte_off = np.concatenate(([0], np.cumsum(nb)))
    posting_bounds = np.concatenate((posting_starts, [positions_flat.size]))
    posting_byte = byte_off[posting_bounds]  # byte offset at each posting boundary

    tb = term_posting_bounds.astype(np.int64)
    pos_col = _spans_to_large_binary(buf_all, posting_byte[tb])

    # per-term offsets arrays: for term t, posting_byte[lo..hi] - posting_byte[lo]
    lens = np.diff(tb) + 1  # n_postings + 1 entries per term
    offs_bounds = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    term_of, within = _segments_arange(offs_bounds)
    gather = tb[:-1][term_of] + within
    rel = posting_byte[gather] - posting_byte[tb[:-1]][term_of]
    pos_offs = pa.ListArray.from_arrays(
        pa.array(offs_bounds.astype(np.int32)), pa.array(rel.astype(np.int64))
    )
    return pos_col, pos_offs


def encode_position_lists(position_lists: list[np.ndarray | list[int]]) -> tuple[bytes, np.ndarray]:
    """Encode per-posting position lists: concat of varint(delta(positions)).

    Returns (buffer, offsets int64[n+1]) where positions of posting i live at
    buffer[offsets[i]:offsets[i+1]].
    """
    bufs = []
    offs = np.zeros(len(position_lists) + 1, dtype=np.int64)
    for i, p in enumerate(position_lists):
        arr = np.asarray(p, dtype=np.uint64)
        enc = varint_encode(delta_encode(arr)) if arr.size else b""
        bufs.append(enc)
        offs[i + 1] = offs[i] + len(enc)
    return b"".join(bufs), offs


def decode_positions(buf: bytes | memoryview, start: int, end: int) -> np.ndarray:
    return delta_decode(varint_decode(np.frombuffer(buf, dtype=np.uint8, count=end - start, offset=start)))
