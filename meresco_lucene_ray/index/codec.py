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


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized.

    Works in O(max_bytes) numpy passes (≤10 for uint64).
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    threshold = np.uint64(1 << 7)
    shifted = v >> np.uint64(7)
    while True:
        mask = shifted > 0
        if not mask.any():
            break
        nbytes[mask] += 1
        shifted = shifted >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        byte = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a LEB128 buffer to uint64, vectorized via reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = b < 0x80
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
    """Encode one term's postings (docids sorted asc).

    Returns (docs_buf, tfs_buf, block_last_doc[int64], block_max_tf[int32]).
    """
    docids = np.asarray(docids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    docs_buf = varint_encode(delta_encode(docids))
    tfs_buf = varint_encode(tfs)
    n = docids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    last = docids[np.minimum(np.arange(1, nblocks + 1) * BLOCK_SIZE - 1, n - 1)].astype(np.int64)
    # block max tf via reduceat on block starts
    starts = np.arange(0, n, BLOCK_SIZE)
    maxtf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    return docs_buf, tfs_buf, last, maxtf


def decode_postings(docs_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's postings -> (docids uint64 asc, tfs uint64)."""
    gaps = varint_decode(docs_buf)
    docids = delta_decode(gaps)
    tfs = varint_decode(tfs_buf)
    return docids, tfs


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
