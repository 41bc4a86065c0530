"""Deduplication operators for training-data pipelines.

Exact dedup mirrors the reference's upsert/grouping semantics (hash-partition
+ per-group representative, Q11/A3); the near-dup family (MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine) extends it the way a 100 TB
training-data pipeline needs.

Scale shapes:
- exact: map_batches(add content hash) → groupby(hash).aggregate(Min, Count)
  — one hash shuffle with Arrow-native combiners, zero per-group Python.
- minhash-lsh: map_batches(shingle→minhash, vectorized) → explode to one row
  per band → groupby(hash part) → vectorized run-detection per part — the
  classic shingle→minhash→band→bucket pipeline; no pairwise work outside
  buckets and no per-bucket Python either.
- simhash: vectorized 64-bit simhash per doc (dictionary-hashed tokens,
  per-doc bit counts via reduceat).
- embedding cosine: per-batch normalized matmul against a broadcast matrix.

Hash specs are FROZEN at the round-1 values (FNV-1a via hashing.fnv1a_arrow
== textstats.hash_str): the vectorized paths emit bit-identical signatures
and buckets.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokens, tokenize_batch
from .hashing import cached_stage, fnv1a_arrow, list_col_to_matrix, ragged_arange, strip_meta


# ---------- exact dedup ----------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_md5") -> pa.Table:
    """md5 hexdigest per row, hashing Arrow buffer slices directly — no
    Python str materialization / re-encode of the corpus (same pattern as
    the build's ``_sha256_column``; utf-8 bytes are hashed either way)."""
    from .hashing import _string_view

    batch = strip_meta(batch)
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    offs, data = _string_view(col)
    mv = memoryview(data) if data.size else memoryview(b"")
    md5 = hashlib.md5
    hashes = [md5(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(col))]
    return batch.append_column(out, pa.array(hashes, type=pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """groupby(content hash) → Min(id), Count() — Arrow-native aggregates
    (partial combine inside map tasks, one small shuffle, no per-group
    Python).  Returns a Dataset of (content_md5, keep_id, dup_count)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )
    return hashed.groupby("content_md5").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count")
    )


# ---------- MinHash + LSH ---------------------------------------------------

MERSENNE = (1 << 61) - 1


class MinHasher:
    """Vectorized MinHash over word shingles (actor-pool stage: permutation
    parameters generated once per actor from a fixed seed).

    Shingle strings are built with Arrow take + binary_join, hashed with the
    vectorized FNV kernel, and reduced per doc with minimum.reduceat — the
    per-doc signature values are bit-identical to round 1's per-shingle
    Python loop (same FNV-1a, same u64-wrapping (a*x+b) mod p arithmetic)."""

    def __init__(self, text_col: str = "text", num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.n = shingle_n

    def _shingle_hashes(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(fnv64 of every shingle, shingle count per doc) — doc-contiguous.

        Per the frozen spec: docs with < n tokens contribute ONE shingle
        joining all their tokens (the empty doc contributes '')."""
        codes, _doc_idx, dic, dl = arrow_tokens(batch[self.text_col])
        n = self.n
        ndocs = len(batch)
        doc_starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
        sc = np.where(dl >= n, dl - n + 1, 1).astype(np.int64)  # shingles per doc
        tok_cnt = np.where(dl >= n, n, dl).astype(np.int64)  # tokens per shingle
        tok_cnt_per_shingle = np.repeat(tok_cnt, sc)
        within = ragged_arange(sc)  # shingle ordinal within doc
        tok_start = np.repeat(doc_starts, sc) + within  # first token of shingle
        flat_idx = np.repeat(tok_start, tok_cnt_per_shingle) + ragged_arange(
            tok_cnt_per_shingle
        )
        token_arr = dic.take(pa.array(codes, type=pa.int32()))
        shingle_tokens = token_arr.take(pa.array(flat_idx, type=pa.int64()))
        offsets = np.concatenate(([0], np.cumsum(tok_cnt_per_shingle)))
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), shingle_tokens
        )
        joined = pc.binary_join(lists, " ")
        return fnv1a_arrow(joined), sc

    def signatures(self, batch: pa.Table) -> np.ndarray:
        """(ndocs, num_perm) uint64 signature matrix."""
        from .hashing import mersenne_reduce_inplace

        hv, sc = self._shingle_hashes(batch)
        hvm = mersenne_reduce_inplace(hv)  # == hv % p, shift/add only
        ndocs = sc.size
        sig = np.empty((ndocs, self.num_perm), dtype=np.uint64)
        sh_starts = np.concatenate(([0], np.cumsum(sc)))
        # chunk doc ranges so the (num_perm, shingles) work matrix stays small
        target = 65536
        lo = 0
        while lo < ndocs:
            # largest hi with ≤ target shingles (always ≥ 1 doc)
            hi = int(np.searchsorted(sh_starts, sh_starts[lo] + target, side="left"))
            hi = min(max(hi - 1, lo + 1), ndocs)
            seg = hvm[sh_starts[lo] : sh_starts[hi]]
            # same u64-wrapping arithmetic as round 1: (a*x) wraps mod 2^64,
            # then % p, then +b, then % p — mods via in-place shift/add
            mat = self.a[:, None] * seg[None, :]
            mersenne_reduce_inplace(mat)
            mat += self.b[:, None]  # both < p ⇒ sum < 2^62, no wrap
            mersenne_reduce_inplace(mat)
            rel_starts = (sh_starts[lo:hi] - sh_starts[lo]).astype(np.int64)
            sig[lo:hi, :] = np.minimum.reduceat(mat, rel_starts, axis=1).T
            lo = hi
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        sig = self.signatures(batch)
        values = pa.array(sig.reshape(-1).astype(np.int64))
        offsets = pa.array(
            np.arange(len(batch) + 1, dtype=np.int32) * np.int32(self.num_perm)
        )
        return batch.append_column(
            "minhash", pa.ListArray.from_arrays(offsets, values)
        )


def minhash_stage(batch: pa.Table, text_col="text", num_perm=64, shingle_n=3) -> pa.Table:
    """TASK-pool MinHash map fn (state cached per worker via cached_stage —
    cheaper than an actor pool for this trivially-rebuildable state)."""
    return cached_stage(MinHasher, text_col, num_perm, shingle_n)(batch)


def _band_hash_rows(batch: pa.Table, id_col: str, bands: int) -> pa.Table:
    """Explode signatures to (id, band, band_hash) rows — one row per band.

    Frozen band-hash spec: FNV-1a of the '|'-joined decimal strings of the
    band's signature values, masked to 63 bits."""
    ids = batch[id_col]
    mh = batch["minhash"]
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    ndocs = len(batch)
    num_perm = len(mh[0]) if ndocs else 0
    rows_per_band = num_perm // bands if bands else 0
    flat = mh.flatten()  # int64, doc-major, perm order
    dec = pc.cast(flat, pa.string())
    n_groups = ndocs * bands
    offsets = pa.array(
        np.arange(n_groups + 1, dtype=np.int32) * np.int32(rows_per_band)
    )
    joined = pc.binary_join(pa.ListArray.from_arrays(offsets, dec), "|")
    bh = (fnv1a_arrow(joined) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    rep_idx = pa.array(np.repeat(np.arange(ndocs, dtype=np.int64), bands))
    return pa.table(
        {
            id_col: ids.take(rep_idx),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), ndocs)),
            "band_hash": pa.array(bh),
        }
    )


def minhash_lsh_candidates(
    ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle_n=3,
    num_parts: int = 64, max_bucket: int | None = None,
):
    """shingle → minhash → band → bucket groupby → candidate duplicate groups.

    Returns a Dataset of (band, band_hash, ids list) for buckets with ≥2 docs.

    The bucket stage groups by a PARTITION of the (band, band_hash) space
    (``num_parts`` per band) and run-detects buckets vectorized inside each
    part — Python cost is O(num_parts), not O(buckets).  Raise ``num_parts``
    when a part (≈ total_band_rows / (bands × num_parts)) outgrows a task.

    ``max_bucket`` is the SKEW guard: boilerplate text (license headers,
    generated files) lands thousands of docs in one bucket and downstream
    pair verification is quadratic in bucket size — buckets larger than the
    cap are dropped (standard LSH practice; their members still surface
    through their other, more selective bands).  None keeps every bucket."""
    sigged = ds.map_batches(
        minhash_stage,
        fn_kwargs=dict(text_col=text_col, num_perm=num_perm, shingle_n=shingle_n),
        batch_format="pyarrow",
        batch_size=1024,
    )

    def explode(batch: pa.Table) -> pa.Table:
        t = _band_hash_rows(batch, id_col, bands)
        part = (
            t["band"].to_numpy().astype(np.int64) * num_parts
            + t["band_hash"].to_numpy() % num_parts
        )
        return t.append_column("part", pa.array(part))

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def bucket_part(t: pa.Table) -> pa.Table:
        bd = t["band"].to_numpy()
        bh = t["band_hash"].to_numpy()
        ids = t[id_col].to_numpy()
        order = np.lexsort((ids, bh, bd))
        bd, bh, ids = bd[order], bh[order], ids[order]
        new = np.ones(bd.size, dtype=bool)
        new[1:] = (bd[1:] != bd[:-1]) | (bh[1:] != bh[:-1])
        gstart = np.flatnonzero(new)
        glen = np.diff(np.append(gstart, bd.size))
        keep = glen >= 2
        if max_bucket is not None:
            keep &= glen <= max_bucket
        if not keep.any():
            return pa.table(
                {
                    "band": pa.array([], type=pa.int64()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "ids": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        elem_keep = np.repeat(keep, glen)
        kept_ids = ids[elem_keep]
        offsets = np.concatenate(([0], np.cumsum(glen[keep])))
        return pa.table(
            {
                "band": pa.array(bd[gstart[keep]].astype(np.int64)),
                "band_hash": pa.array(bh[gstart[keep]]),
                "ids": pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()),
                    pa.array(kept_ids.astype(np.int64)),
                ),
            }
        )

    return (
        exploded.groupby("part")
        .map_groups(bucket_part, batch_format="pyarrow")
        .select_columns(["band", "band_hash", "ids"])
    )


# ---------- SimHash ---------------------------------------------------------

class SimHasher:
    """64-bit SimHash over tokens (tf-weighted bit voting), fully vectorized:
    the token dictionary is FNV-hashed once, per-doc bit counts come from one
    reduceat over the occurrence stream.  Bit-identical to the round-1
    per-doc loop (votes_j > 0 ⇔ 2·setcount_j > doc_len)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes, doc_idx, dic, dl = arrow_tokens(batch[self.text_col])
        ndocs = len(batch)
        hv = fnv1a_arrow(dic)
        bits_dict = (
            (hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int32)
        out = np.zeros(ndocs, dtype=np.uint64)
        doc_starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
        nonempty = np.flatnonzero(dl > 0)
        if nonempty.size:
            # chunk the (tokens, 64) occurrence matrix to bound memory
            CH = 1 << 17
            bit_cols = np.uint64(1) << np.arange(64, dtype=np.uint64)
            lo = 0
            while lo < nonempty.size:
                hi = lo
                tok0 = doc_starts[nonempty[lo]]
                while (
                    hi < nonempty.size
                    and doc_starts[nonempty[hi]] + dl[nonempty[hi]] - tok0 <= CH
                ):
                    hi += 1
                hi = max(hi, lo + 1)
                sel = nonempty[lo:hi]
                tok_end = doc_starts[sel[-1]] + dl[sel[-1]]
                rows = bits_dict[codes[tok0:tok_end]]
                setcnt = np.add.reduceat(rows, (doc_starts[sel] - tok0).astype(np.int64), axis=0)
                hit = (2 * setcnt) > dl[sel][:, None]
                out[sel] = (hit.astype(np.uint64) * bit_cols[None, :]).sum(axis=1)
                lo = hi
        return strip_meta(batch).append_column("simhash", pa.array(out.astype(np.int64)))


# ---------- n-gram Jaccard ---------------------------------------------------

def jaccard_pairs(ds, candidate_groups, text_col="text", id_col="doc_id", n=3, threshold=0.8):
    """Verify candidate groups by exact n-gram Jaccard similarity.

    ``candidate_groups``: list of id lists (e.g. from minhash_lsh_candidates).
    Fetches candidate docs once, verifies pairwise inside each (small) group.
    Driver-side convenience wrapper — use ``verify_neardup_pairs`` for the
    distributed candidate-then-verify pipeline."""
    import itertools

    cand_ids = sorted({i for g in candidate_groups for i in g})
    if not cand_ids:
        return []
    idset = set(cand_ids)
    texts = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids = batch[id_col].to_pylist()
        txts = batch[text_col].to_pylist()
        for i, t in zip(ids, txts):
            if i in idset:
                texts[i] = t
    shingles = {
        i: {" ".join(tok[j : j + n]) for j in range(max(1, len(tok) - n + 1))}
        for i, tok in ((i, tokenize_batch([texts[i]])[0]) for i in cand_ids)
    }
    out = []
    seen = set()
    for g in candidate_groups:
        for a, b in itertools.combinations(sorted(g), 2):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            sa, sb = shingles[a], shingles[b]
            jac = len(sa & sb) / max(1, len(sa | sb))
            if jac >= threshold:
                out.append((a, b, jac))
    return sorted(out)


class _ShingleSetStage:
    """map_batches stage: per doc, the SORTED UNIQUE fnv64 hashes of its word
    n-gram shingles (the Jaccard verification signature)."""

    def __init__(self, id_col: str, text_col: str, n: int):
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self._mh = MinHasher(text_col, num_perm=1, shingle_n=n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hv, sc = self._mh._shingle_hashes(batch)
        # NOTE: round-1 spec built shingles as max(1, L-n+1) windows (an
        # L<n doc yields ONE shingle of all its tokens) — _shingle_hashes
        # reproduces exactly that.  Per-doc sorted-unique via ONE segmented
        # sort: order by (doc, hash), then run-detect.
        doc_of = np.repeat(np.arange(sc.size, dtype=np.int64), sc)
        order = np.lexsort((hv, doc_of))
        d_s, h_s = doc_of[order], hv[order]
        first = np.ones(h_s.size, dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        flat = h_s[first]
        per_doc = np.bincount(d_s[first], minlength=sc.size)
        byte_offsets = np.concatenate(([0], np.cumsum(per_doc * 8))).astype(np.int64)
        # encode each doc's sorted-unique hash set as a raw uint64 blob:
        # Acero hash joins carry binary payloads but not list columns
        blob = flat.astype("<u8").tobytes()
        return pa.table(
            {
                "__sid__": batch[self.id_col],
                "shingle_hashes": pa.LargeBinaryArray.from_buffers(
                    pa.large_binary(),
                    sc.size,
                    [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(blob)],
                ),
            }
        )


def _segment_jaccard(
    va_flat: np.ndarray, na: np.ndarray, vb_flat: np.ndarray, nb: np.ndarray
) -> np.ndarray:
    """Jaccard per pair from per-pair-concatenated sorted-unique u64 value
    segments: each row's hashes are UNIQUE within the row (set semantics from
    :class:`_ShingleSetStage`), so |A∩B| = count of duplicate values inside
    one pair after a global (pair_id, value) lexsort — no per-pair Python."""
    n_pairs = na.size
    vals = np.concatenate([va_flat, vb_flat])
    pids = np.concatenate(
        [np.repeat(np.arange(n_pairs), na), np.repeat(np.arange(n_pairs), nb)]
    )
    order = np.lexsort((vals, pids))
    sv, sp = vals[order], pids[order]
    dup = np.zeros(sv.size, dtype=bool)
    dup[1:] = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    inter = np.bincount(sp[dup], minlength=n_pairs).astype(np.int64)
    return inter / np.maximum(1, na + nb - inter)


def _take_ranges(flat: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Gather ``flat[starts[i] : starts[i]+counts[i]]`` for every i into one
    concatenated array — the vectorized segment gather (no Python loop)."""
    total = int(counts.sum())
    if total == 0:
        return flat[:0]
    out_starts = np.cumsum(counts) - counts
    idx = np.repeat(starts - out_starts, counts) + np.arange(total)
    return flat[idx]


def _distinct_ab_idx(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row indices of the distinct (a, b) pairs in (a, b)-ascending order —
    the lexsort-distinct idiom shared by candidate explode, both verify
    paths' pre-verify distinct, and the post-verify global distinct."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.ones(a.size, dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return order[first]


def _gather_sig_payload(*tables):
    """Assemble the broadcast shingle-signature payload inside a Ray task:
    (sorted doc ids, per-doc segment starts/counts, one flat u64 value
    array).  Runs off-driver; the result lives in the object store and is
    read zero-copy by every verify task (one copy per node on a cluster).

    Zero-COLUMN blocks are filtered first: the involved-id ``broadcast_semi``
    empties most corpus blocks at scale, and Ray 2.49 materializes a fully
    emptied block with an EMPTY schema (the same quirk the driver path
    guards with its ``num_columns`` filter) — ``select`` on one raises."""
    from .hashing import _string_view

    tables = [tb for tb in tables if tb.num_columns]
    if not tables:
        return {
            "sid": np.empty(0, dtype=np.int64),
            "vals": np.empty(0, dtype=np.uint64),
            "starts": np.empty(0, dtype=np.int64),
            "counts": np.empty(0, dtype=np.int64),
        }
    t = pa.concat_tables(
        [tb.select(["__sid__", "shingle_hashes"]) for tb in tables],
        promote_options="default",
    )
    sid = t["__sid__"].to_numpy(zero_copy_only=False)
    order = np.argsort(sid, kind="stable")
    blobs = t["shingle_hashes"].combine_chunks().take(pa.array(order))
    off, data = _string_view(blobs)
    vals = data[off[0] : off[-1]].view("<u8").astype(np.uint64, copy=False)
    counts = (np.diff(off) // 8).astype(np.int64)
    starts = np.cumsum(counts) - counts
    return {
        "sid": sid[order],
        "vals": np.ascontiguousarray(vals),
        "starts": starts,
        "counts": counts,
    }


_SIG_GATHER_REMOTE = None  # decorated once per process, not re-exported per query


class _PairVerifyStage:
    """map_batches stage for the broadcast-sigs verify path: look both sides
    of each (id_a, id_b) pair up in the broadcast signature payload and run
    the shared segment-Jaccard kernel.  Pairs whose id is absent from the
    signatures are dropped (inner-join semantics, matching the join path)."""

    # keyed on a per-query ObjectRef, so entries are never reused across
    # queries — and each pins a ≤256 MB plasma payload via its zero-copy
    # views; bound to current + draining instead of the 32-slot FIFO
    CACHE_SLOTS = 2

    def __init__(self, payload_ref, threshold: float):
        import ray

        p = ray.get(payload_ref)  # zero-copy numpy views into the object store
        self.sid = p["sid"]
        self.vals = p["vals"]
        self.starts = p["starts"]
        self.counts = p["counts"]
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
        if len(t) == 0 or self.sid.size == 0:
            return empty
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        pos_a = np.searchsorted(self.sid, a)
        pos_b = np.searchsorted(self.sid, b)
        last = self.sid.size - 1
        ok = (
            (pos_a < self.sid.size)
            & (pos_b < self.sid.size)
            & (self.sid[np.minimum(pos_a, last)] == a)
            & (self.sid[np.minimum(pos_b, last)] == b)
        )
        a, b, pos_a, pos_b = a[ok], b[ok], pos_a[ok], pos_b[ok]
        if a.size == 0:
            return empty
        na, nb = self.counts[pos_a], self.counts[pos_b]
        va = _take_ranges(self.vals, self.starts[pos_a], na)
        vb = _take_ranges(self.vals, self.starts[pos_b], nb)
        jac = _segment_jaccard(va, na, vb, nb)
        keep = jac >= self.threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )


def verify_neardup_pairs(
    ds, buckets, text_col="text", id_col="doc_id", n=3, threshold=0.8
):
    """Distributed candidate-then-verify: explode LSH buckets to unique
    (id_a, id_b) pairs, attach each side's shingle-hash set via hash joins,
    and verify Jaccard inside map_batches — no document text and no pairwise
    state ever touches the driver.

    ``buckets``: Dataset of (band, band_hash, ids list) from
    ``minhash_lsh_candidates``.  Jaccard is computed over 64-bit shingle
    hashes (collision odds ≈ |set|²/2^64 — negligible); the driver-side
    ``jaccard_pairs`` remains the exact-string variant."""

    def explode_pairs(t: pa.Table) -> pa.Table:
        ids_col = t["ids"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        counts = np.asarray([len(x) for x in ids_col], dtype=np.int64)
        flat = ids_col.flatten().to_numpy()
        gstarts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # all (i<j) index pairs per group, vectorized per group size
        a_parts, b_parts = [], []
        for s, c in zip(gstarts.tolist(), counts.tolist()):
            if c < 2:
                continue
            iu = np.triu_indices(c, k=1)
            g = np.sort(flat[s : s + c])
            a_parts.append(g[iu[0]])
            b_parts.append(g[iu[1]])
        if not a_parts:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
            )
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        # batch-local dedup (a pair repeats across bands); the cheap global
        # distinct happens AFTER verification on the small surviving set —
        # a global pre-verify distinct would shuffle every candidate pair
        # for <1% dup savings
        idx = _distinct_ab_idx(a, b)
        return pa.table({"id_a": pa.array(a[idx]), "id_b": pa.array(b[idx])})

    import ray

    empty_pairs = pa.table(
        {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
    )
    empty_out = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    # materialize the candidate pairs once (block refs only) — the count
    # gates the strategy and BOTH the id filter and the verify consume them
    pair_ds = _snap_nonempty(
        buckets.map_batches(explode_pairs, batch_format="pyarrow"), empty_pairs
    )
    n_pairs = pair_ds.count()
    if n_pairs == 0:
        import ray.data as rd

        return rd.from_arrow(empty_out)

    # Candidates are a tiny fraction of the corpus at any scale — shingling
    # every doc and shuffling every blob through two hash joins does O(corpus)
    # work for O(candidates) output.  When the pair set fits the broadcast
    # gate, ship the involved-id array once (ray.put) and semi-filter the
    # corpus BEFORE the shingle stage; past the gate keep the full-corpus
    # path (the joins then drop uninvolved blobs).
    broadcast_max = int(os.environ.get("MLR_NEARDUP_BROADCAST_MAX", 4_000_000))
    involved_ref = None
    if n_pairs <= broadcast_max:
        from .joins import broadcast_semi, gather_small

        got = gather_small(pair_ds, ["id_a", "id_b"])
        involved = np.unique(np.concatenate([got["id_a"], got["id_b"]]))
        involved_ref = ray.put(involved)
        sig_input = broadcast_semi(ds, id_col, involved_ref)
    else:
        sig_input = ds

    def shingle_set_stage(batch: pa.Table) -> pa.Table:
        return cached_stage(_ShingleSetStage, id_col, text_col, n)(batch)

    # materialize once — BOTH joins consume it (re-executing the tokenize +
    # shingle stage twice is the recompute trap flagged in round 1)
    sigs = sig_input.map_batches(
        shingle_set_stage, batch_format="pyarrow", batch_size=1024
    ).materialize()

    # The two renames MUST be distinct map_batches UDFs, not lazy
    # rename_columns branches: Ray 2.49's plan dedup conflates two
    # rename_columns views of one materialized dataset when both feed
    # chained hash joins, and the second join then sees the wrong-schema
    # left input ("No match or multiple matches for FieldRef id_b").
    # Arrow rename is metadata-only, so the map stays zero-copy.
    def _as_a(t: pa.Table) -> pa.Table:
        return t.select(["__sid__", "shingle_hashes"]).rename_columns(["id_a", "sh_a"])

    def _as_b(t: pa.Table) -> pa.Table:
        return t.select(["__sid__", "shingle_hashes"]).rename_columns(["id_b", "sh_b"])

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        sa = t["sh_a"]
        sb = t["sh_b"]
        if isinstance(sa, pa.ChunkedArray):
            sa = sa.combine_chunks()
        if isinstance(sb, pa.ChunkedArray):
            sb = sb.combine_chunks()
        # vectorized pairwise set-intersection over the blob payloads via the
        # shared segment-Jaccard kernel
        from .hashing import _string_view

        oa, da = _string_view(sa)
        ob, db = _string_view(sb)
        va = da[oa[0] : oa[-1]].view("<u8")
        vb = db[ob[0] : ob[-1]].view("<u8")
        na = (np.diff(oa) // 8).astype(np.int64)
        nb = (np.diff(ob) // 8).astype(np.int64)
        jac = _segment_jaccard(va, na, vb, nb)
        keep = jac >= threshold
        idx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "id_a": t["id_a"].take(idx),
                "id_b": t["id_b"].take(idx),
                "jaccard": pa.array(jac[keep]),
            }
        )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        return t.take(pa.array(_distinct_ab_idx(a, b)))

    # Driver verify gate: with few candidate pairs the two hash joins are
    # pure all-to-all overhead — stream the (already involved-only) sig rows
    # in, gather the pairs, and run the SAME vectorized verify kernel once.
    # Driver memory is O(pairs × avg shingle-blob), bounded by the gate.
    # The gate is on estimated verify WORK (pairs × both sides' avg shingle
    # values — the lexsort input size), not bare pair count: 200k pairs of
    # long docs is ~10s of single-thread kernel time that the distributed
    # path spreads across the cluster.
    driver_max = int(os.environ.get("MLR_NEARDUP_DRIVER_MAX", 200_000))
    driver_values_max = int(
        os.environ.get("MLR_NEARDUP_DRIVER_VALUES_MAX", 16_000_000)
    )
    est_values = None
    if involved_ref is not None and n_pairs <= driver_max:
        n_sigs = sigs.count()
        avg_vals = (sigs.size_bytes() / max(1, n_sigs)) / 8.0  # blob-dominated
        est_values = n_pairs * 2.0 * avg_vals
    if est_values is not None and est_values <= driver_values_max:
        import ray.data as rd

        sig_parts = list(sigs.iter_batches(batch_format="pyarrow", batch_size=8192))
        sig_parts = [t for t in sig_parts if t.num_columns]
        if not sig_parts:
            return rd.from_arrow(empty_out)
        sig_tbl = pa.concat_tables(sig_parts, promote_options="default")
        sid = sig_tbl["__sid__"].to_numpy(zero_copy_only=False)
        if sid.size == 0:  # columns but no rows: nothing can verify
            return rd.from_arrow(empty_out)
        order = np.argsort(sid, kind="stable")
        sid_s = sid[order]
        blobs = sig_tbl["shingle_hashes"].combine_chunks().take(pa.array(order))
        a, b = got["id_a"], got["id_b"]
        # global distinct BEFORE verify (≡ distinct after: dup pairs verify
        # to identical rows)
        idx = _distinct_ab_idx(a, b)
        a, b = a[idx], b[idx]
        pos_a = np.searchsorted(sid_s, a)
        pos_b = np.searchsorted(sid_s, b)
        ok = (
            (pos_a < sid_s.size)
            & (pos_b < sid_s.size)
            & (sid_s[np.minimum(pos_a, sid_s.size - 1)] == a)
            & (sid_s[np.minimum(pos_b, sid_s.size - 1)] == b)
        )
        a, b, pos_a, pos_b = a[ok], b[ok], pos_a[ok], pos_b[ok]
        t = pa.table(
            {
                "id_a": pa.array(a),
                "id_b": pa.array(b),
                "sh_a": blobs.take(pa.array(pos_a)),
                "sh_b": blobs.take(pa.array(pos_b)),
            }
        )
        return rd.from_arrow(verify(t))

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # pragma: no cover - resources unavailable mid-shutdown
        ncpu = 4

    # Broadcast-sigs verify: when the involved docs' signature payload fits
    # the gate, ship it ONCE (object store; one copy per node) and verify
    # pairs in embarrassingly-parallel map_batches — no blob shuffle at all.
    # The two chained hash joins cost several seconds of exchange latency
    # that this path skips entirely; past the gate the joins remain the
    # scale path (pairs and signatures both unbounded at 100 TB).
    bcast_sigs_max = int(os.environ.get("MLR_NEARDUP_BCAST_SIGS_MAX", 268_435_456))
    if involved_ref is not None and sigs.size_bytes() <= bcast_sigs_max:
        global _SIG_GATHER_REMOTE
        if _SIG_GATHER_REMOTE is None:
            _SIG_GATHER_REMOTE = ray.remote(num_cpus=1)(_gather_sig_payload)
        sig_refs = sigs.to_arrow_refs()  # sigs is materialized (contract above)
        payload_ref = _SIG_GATHER_REMOTE.remote(*sig_refs)

        def pair_verify(t: pa.Table) -> pa.Table:
            return cached_stage(_PairVerifyStage, payload_ref, threshold)(t)

        # the pairs are already on the driver (``got``, gathered for the
        # involved-id filter): global-distinct them HERE — a pair repeats
        # across LSH bands (≈5× at 16 bands), and each duplicate would
        # re-run the full intersection kernel.  O(pairs) int64 lexsort,
        # bounded by the broadcast gate.
        import ray.data as rd

        a, b = got["id_a"], got["id_b"]
        idx = _distinct_ab_idx(a, b)
        a, b = a[idx], b[idx]
        nparts = max(1, min(1024, max(ncpu, a.size // 200_000)))
        verified = (
            rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
            .repartition(nparts)
            .map_batches(pair_verify, batch_format="pyarrow")
        )
    else:
        # join path: partition count scales with the pair set AND with the
        # cluster — the fused join→verify task is compute-heavy (the
        # per-pair intersection lexsort), so fewer partitions than cores
        # leaves the cluster idle even when the pair set is small
        num_partitions = max(4, min(1024, max(ncpu, n_pairs // 1_000_000 + 4)))
        verified = pair_ds.join(
            sigs.map_batches(_as_a, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("id_a",),
        ).join(
            sigs.map_batches(_as_b, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("id_b",),
        ).map_batches(verify, batch_format="pyarrow")

    # global distinct on the small VERIFIED set: coalesce to one block, drop
    # cross-band duplicates (identical jaccard by construction)
    return (
        verified
        .repartition(1)
        .map_batches(distinct_pairs, batch_format="pyarrow", batch_size=None)
    )


# ---------- embedding cosine near-dup ---------------------------------------

class CosineScorer:
    """Per-batch cosine against a broadcast (ray.put) normalized query matrix."""

    def __init__(self, query_ref, vec_col: str = "embedding"):
        import ray

        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        mat = list_col_to_matrix(batch[self.vec_col], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-30)
        sims = mat @ self.q.T  # (batch, n_queries)
        if sims.shape[1] == 1:
            return batch.append_column("cosine", pa.array(sims[:, 0]))
        return batch.append_column(
            "cosine", pa.array(list(sims), type=pa.list_(pa.float64()))
        )


def embedding_neardup_pairs(ds, vec_col="embedding", id_col="vec_id", group_col=None, threshold=0.95):
    """All pairs with cosine ≥ threshold within a blocking group.

    ``group_col`` is REQUIRED (the scalable path: partition by a cheap
    blocking key — label, LSH bucket — then pairwise inside groups); the
    unblocked all-pairs variant was removed as a 100 TB foot-gun."""
    import pandas as pd

    if group_col is None:
        raise ValueError(
            "embedding_neardup_pairs requires a blocking group_col; "
            "derive one (e.g. an LSH bucket via functions.ann.lsh_bucket) "
            "instead of all-pairs comparison"
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.asarray(list(g[vec_col]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sims[iu] >= threshold
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[iu][hit]})

    return ds.groupby(group_col).map_groups(pairs, batch_format="pandas")


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bitwise_count):
    one unpackbits pass over the byte view."""
    if v.size == 0:
        return np.zeros(0, dtype=np.int64)
    return (
        np.unpackbits(np.ascontiguousarray(v).view(np.uint8))
        .reshape(v.size, 64)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_neardup_pairs(
    ds, text_col="text", id_col="doc_id", max_hamming=3,
    num_parts: int = 64, max_bucket: int | None = 64,
):
    """SimHash near-duplicate pairs: candidates from exact-match band
    buckets, verified by exact Hamming distance.

    Banding is the pigeonhole LSH for Hamming space: splitting the 64-bit
    simhash into ``max_hamming + 1`` equal bands guarantees every pair
    within ``max_hamming`` bit flips matches EXACTLY on at least one band —
    zero recall loss (unlike MinHash banding), candidate cost ∝ bucket
    collisions.  Buckets over ``max_bucket`` are dropped (boilerplate skew
    guard, same policy as minhash_lsh_candidates).  Pairs carry both
    signatures through the bucket groupby, so verification is an in-batch
    xor+popcount — no join, no driver state.  Returns a Dataset of
    (id_a, id_b, hamming), globally distinct."""
    bands = max_hamming + 1
    assert 64 % bands == 0, "max_hamming+1 must divide 64 (e.g. 1, 3, 7, 15)"
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    sigged = ds.map_batches(SimHasher(text_col), batch_format="pyarrow", batch_size=1024)

    def explode(batch: pa.Table) -> pa.Table:
        sim = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = ids.size
        band = np.repeat(np.arange(bands, dtype=np.int64), n)
        tiled = np.tile(sim, bands)
        bh = ((tiled >> (band.astype(np.uint64) * np.uint64(width))) & mask).astype(np.int64)
        part = band * num_parts + bh % num_parts
        return pa.table(
            {
                "band": pa.array(band),
                "band_hash": pa.array(bh),
                "id": pa.array(np.tile(ids, bands)),
                "sim": pa.array(tiled.astype(np.int64)),
                "part": pa.array(part),
            }
        )

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        bd = t["band"].to_numpy()
        bh = t["band_hash"].to_numpy()
        ids = t["id"].to_numpy()
        sim = t["sim"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, bh, bd))
        bd, bh, ids, sim = bd[order], bh[order], ids[order], sim[order]
        new = np.ones(bd.size, dtype=bool)
        new[1:] = (bd[1:] != bd[:-1]) | (bh[1:] != bh[:-1])
        gstart = np.flatnonzero(new)
        glen = np.diff(np.append(gstart, bd.size))
        keep = (glen >= 2) if max_bucket is None else ((glen >= 2) & (glen <= max_bucket))
        a_parts, b_parts, ha_parts = [], [], []
        for s, c in zip(gstart[keep].tolist(), glen[keep].tolist()):
            iu, ju = np.triu_indices(c, k=1)
            ia, ib = ids[s + iu], ids[s + ju]
            sa, sb = sim[s + iu], sim[s + ju]
            ham = _popcount64(sa ^ sb)
            ok = ham <= max_hamming
            a_parts.append(ia[ok])
            b_parts.append(ib[ok])
            ha_parts.append(ham[ok])
        if not a_parts:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_parts)),
                "id_b": pa.array(np.concatenate(b_parts)),
                "hamming": pa.array(np.concatenate(ha_parts)),
            }
        )

    def distinct(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        order = np.lexsort((b, a))
        first = np.ones(a.size, dtype=bool)
        first[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        return t.take(pa.array(order[first]))

    # verified set is small → one-block global distinct (pairs repeat across bands)
    return (
        exploded.groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .repartition(1)
        .map_batches(distinct, batch_format="pyarrow", batch_size=None)
    )


# ---------- duplicate-group connected components -----------------------------

def _snap_nonempty(ds, empty: pa.Table):
    """Materialize a Dataset and drop Ray 2.49's zero-row blocks, which carry
    an EMPTY (zero-column) schema: a hash join whose input partition
    concatenates one of those loses the key column ("No match ... for
    FieldRef.Name(...)").  Block refs only — nothing is fetched to the
    driver.  ``empty`` supplies the schema when every block is empty."""
    import ray.data as rd

    mat = ds.materialize()
    refs = [
        block_ref
        for bundle in mat.iter_internal_ref_bundles()
        for block_ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(refs)


def connected_components(
    pairs, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 50, num_partitions: int | None = None
):
    """Distributed connected components over a (id_a, id_b) pair Dataset by
    min-label propagation: every node repeatedly adopts the smallest label
    seen among itself and its neighbors until fixpoint.  The final step of a
    dedup pipeline — near-dup PAIRS become duplicate GROUPS with the minimum
    doc id as the canonical representative (what the reference's dedup field
    collapses per key, lifted to transitive near-dup identity).

    Scale shape: edges are materialized ONCE (symmetric, deduped per batch)
    and each iteration is one hash join (labels onto edge sources) plus one
    groupby-min — both Ray-native shuffles keyed on the node id, no driver
    state, no per-group Python.  Pointer jumping (each node also adopts its
    label's label) makes the round count O(log diameter) — a pathological
    chain converges in a handful of rounds, a dense dup cluster in 2-3 (see
    tests/test_connected_components.py::test_long_chain).  Convergence is
    detected EXACTLY: each round counts nodes whose label improved (an
    aggregate over the grouped union, no label-sum overflow games at 10^12
    ids).

    Returns a Dataset of (node, component) — one row per node that appears
    in any pair, component = min node id reachable.  Singletons (docs in no
    pair) are implicitly their own component and never enter the loop.
    """
    from ray.data.aggregate import Min, Sum

    def snap(ds):
        return _snap_nonempty(
            ds,
            pa.table(
                {"node": pa.array([], type=pa.int64()), "label": pa.array([], type=pa.int64())}
            ),
        )

    def symmetric(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        first = np.ones(src.size, dtype=bool)
        first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        return pa.table({"node": pa.array(src[first]), "nbr": pa.array(dst[first])})

    edges = snap(pairs.map_batches(symmetric, batch_format="pyarrow"))
    n_edges = edges.count()
    if n_edges == 0:  # no pairs → no components (Ray 2.49's hash join
        import ray.data as rd  # cannot take an all-empty side)

        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], type=pa.int64()), "component": pa.array([], type=pa.int64())}
            )
        )

    # Driver gate: below the threshold the per-round hash joins + groupbys
    # are pure all-to-all overhead — 16 bytes/edge means the default 2M-edge
    # gate is a ~32 MB driver array; the same min-label propagation with
    # pointer jumping runs in numpy in milliseconds.  Past the gate the
    # distributed rounds below handle any edge count.
    driver_max = int(os.environ.get("MLR_CC_DRIVER_MAX", 2_000_000))
    if n_edges <= driver_max:
        import ray.data as rd

        from .joins import gather_small

        got = gather_small(edges, ["node", "nbr"])
        nodes = np.unique(np.concatenate([got["node"], got["nbr"]]))
        s = np.searchsorted(nodes, got["node"])
        d = np.searchsorted(nodes, got["nbr"])
        label = np.arange(len(nodes), dtype=np.int64)
        for _ in range(max_iters):
            new = label.copy()
            np.minimum.at(new, s, label[d])
            np.minimum.at(new, d, label[s])
            new = np.minimum(new, new[new])  # pointer jumping
            if np.array_equal(new, label):
                break
            label = new
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} iterations"
            )
        # labels are indices into the SORTED node array, so the min index is
        # the min node id — exactly the distributed path's component choice
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes), "component": pa.array(nodes[label])})
        )

    if num_partitions is None:
        # scale the join shuffle with the edge set (block count is metadata)
        num_partitions = max(8, edges.num_blocks())

    # label_0(u) = min(u, min N(u)) — the first propagation round fused into init
    def init_label(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        m = t["min(nbr)"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"], "label": pa.array(np.minimum(node, m))})

    labels = snap(
        edges.groupby("node")
        .aggregate(Min("nbr"))
        .map_batches(init_label, batch_format="pyarrow")
    )

    def msg_view(t: pa.Table) -> pa.Table:
        # messages: neighbor hears my label; old=+inf marks "not my own row"
        return pa.table(
            {
                "node": t["nbr"],
                "label": t["label"],
                "old": pa.array(np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)),
            }
        )

    def self_view(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["label"], "old": t["label"]})

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "label": t["min(label)"],
                "changed": pc.cast(pc.less(t["min(label)"], t["min(old)"]), pa.int64()),
            }
        )

    def as_lookup(t: pa.Table) -> pa.Table:
        # labels rekeyed by their own node id, to be joined on a LABEL value
        return pa.table({"label": t["node"], "label2": t["label"]})

    def jump_view(t: pa.Table) -> pa.Table:
        # pointer jumping: node u also hears label(label(u)) — halves the
        # remaining distance to the component min each round, so a chain of
        # diameter d converges in O(log d) rounds instead of d
        return pa.table(
            {
                "node": t["node"],
                "label": t["label2"],
                "old": pa.array(np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)),
            }
        )

    for _ in range(max_iters):
        msgs = edges.join(labels, join_type="inner", num_partitions=num_partitions, on=("node",))
        jumped = labels.join(
            labels.map_batches(as_lookup, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
        )
        folded = (
            msgs.map_batches(msg_view, batch_format="pyarrow")
            .union(labels.map_batches(self_view, batch_format="pyarrow"))
            .union(jumped.map_batches(jump_view, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("label"), Min("old"))
            .map_batches(fold, batch_format="pyarrow")
        )
        folded = snap(folded)
        n_changed = (folded.aggregate(Sum("changed", alias_name="n")) or {}).get("n", 0) or 0
        labels = snap(folded.drop_columns(["changed"]))
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iterations")
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def dedup_keep_canonical(ds, components, id_col: str = "doc_id"):
    """Filter a corpus down to one representative per duplicate group: drop
    every row whose id appears in ``components`` with component != node
    (non-canonical member), keep everything else — singletons never entered
    the components table and stream through untouched.

    Scale shape: a LEFT join of the corpus against the (small relative to
    the corpus) components table on the id — Ray's hash-join shuffle keys
    both sides on the id, no broadcast of the corpus, no driver state; the
    filter afterwards is a vectorized Arrow kernel per batch."""

    def drop_view(t: pa.Table) -> pa.Table:
        # non-canonical members only — the rows to be dropped
        keep = pc.not_equal(t["node"], t["component"])
        return pa.table({id_col: t["node"].filter(keep)})

    drops = _snap_nonempty(
        components.map_batches(drop_view, batch_format="pyarrow").map_batches(
            lambda t: t.append_column("__drop__", pa.array(np.ones(len(t), dtype=np.int8))),
            batch_format="pyarrow",
        ),
        pa.table(
            {id_col: pa.array([], type=pa.int64()), "__drop__": pa.array([], type=pa.int8())}
        ),
    )
    n_drops = drops.count()
    if n_drops == 0:  # nothing to drop — and Ray 2.49's hash join
        return ds     # cannot take an all-empty side at all

    # Broadcast gate: the drop-id set is O(duplicate docs) — when it fits
    # one worker's heap (8 bytes/id → the default 16M gate is 128 MB), ship
    # it once via ray.put and anti-filter inside map_batches; no all-to-all
    # shuffle of the corpus at all.  Past the gate, hash-join as before.
    broadcast_max = int(os.environ.get("MLR_DEDUP_BROADCAST_MAX", 16_000_000))
    if n_drops <= broadcast_max:
        from .joins import broadcast_anti, gather_small_ref

        # gather + sort run in a task; only the ObjectRef touches the driver
        return broadcast_anti(ds, id_col, gather_small_ref(drops, [id_col]))

    # partition count derives from the materialized drop side's row count
    # (already known from the gate check; the corpus side is lazy and must
    # not be measured): past the broadcast gate drops grow with the corpus,
    # ~500k drop ids per partition
    from .joins import derive_num_partitions

    joined = ds.join(
        drops,
        join_type="left_outer",
        num_partitions=derive_num_partitions(
            n_drops * 8, bytes_per_partition=4 << 20, lo=8
        ),
        on=(id_col,),
    )

    def keep_rows(t: pa.Table) -> pa.Table:
        if "__drop__" not in t.column_names:  # empty right side
            return t
        mask = pc.is_null(t["__drop__"])
        return t.filter(mask).drop_columns(["__drop__"])

    return joined.map_batches(keep_rows, batch_format="pyarrow")
