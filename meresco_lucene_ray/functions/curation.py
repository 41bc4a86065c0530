"""Training-data curation operators: PII redaction, benchmark
decontamination, stratified sampling, repetition filtering, and sequence
packing.

These have no counterpart in the reference engine (meresco-lucene serves
search, not corpus preparation) — they are the corpus-side operators a
100 TB training-data pipeline runs BEFORE anything is indexed, expressed
Ray-Data-first:

- every per-doc stage is a vectorized ``map_batches`` over Arrow batches
  (RE2 kernels, numpy run-detection — no Python loop over rows);
- small sides (the benchmark shingle set) are broadcast once with
  ``ray.put`` and read zero-copy per task, never re-shipped per batch;
- the one genuinely sequential operator (greedy sequence packing) is a
  classic two-pass distributed prefix sum: per-partition token sums
  (tiny) to the driver, exclusive offsets broadcast back, per-partition
  cumsum inside ``groupby(part).map_groups`` — the corpus itself streams,
  only O(#partitions) rows ever sit on the driver.

All five are mirrored op-for-op by DuckDB oracle SQL in
``pipelines/entries.py`` (Arrow and DuckDB both use RE2, so the regex
semantics match exactly; hashes go through the same FNV-1a arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokens
from .hashing import cached_stage, fnv1a_arrow, strip_meta

# ---- PII redaction --------------------------------------------------------

# RE2-safe patterns (Arrow's replace_substring_regex and DuckDB's
# regexp_replace are both RE2 — identical match semantics by construction).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scrub emails / IPv4s / phone numbers; append ``redacted`` (the
    scrubbed text) and ``n_pii`` (total matches).  Patterns are applied in
    PII_PATTERNS order; replacement tokens contain no digits, so later
    patterns cannot match inside an earlier replacement."""
    batch = strip_meta(batch)
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = np.zeros(len(batch), dtype=np.int64)
    for _name, pat, repl in PII_PATTERNS:
        n += pc.count_substring_regex(col, pat).to_numpy(zero_copy_only=False)
        col = pc.replace_substring_regex(col, pat, replacement=repl)
    return batch.append_column("redacted", col).append_column("n_pii", pa.array(n))


# ---- benchmark decontamination --------------------------------------------


def benchmark_shingle_set(ds, text_col: str = "text", shingle_n: int = 5) -> np.ndarray:
    """Distinct FNV-1a hashes of the benchmark docs' token shingles —
    the SMALL side of decontamination, computed distributed and reduced to
    one sorted uint64 array for broadcast (a benchmark suite is KBs–MBs;
    the corpus being checked is the 100 TB side)."""
    from .dedup import MinHasher

    def hashes(batch: pa.Table) -> pa.Table:
        mh = cached_stage(MinHasher, text_col, 1, shingle_n)
        hv, _sc = mh._shingle_hashes(strip_meta(batch))
        return pa.table({"h": pa.array(np.unique(hv).astype(np.int64))})

    from .dedup import _snap_nonempty

    # snap the INPUT: a filtered benchmark view carries zero-row blocks
    # whose empty schema (Ray 2.49) skips the UDF and mixes schema-less
    # bundles into the hashes stream (RefBundle warning at the consumer);
    # the benchmark suite is the SMALL side, so the barrier costs nothing
    snapped = _snap_nonempty(
        ds, pa.table({text_col: pa.array([], type=pa.string())})
    )
    parts = snapped.map_batches(hashes, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.asarray([r["h"] for r in parts], dtype=np.int64).astype(np.uint64))


class Decontaminator:
    """map_batches stage: per-doc count of DISTINCT shingles shared with the
    broadcast benchmark set (``ray.put`` once, ``ray.get`` zero-copy per
    actor/worker — never shipped per batch)."""

    def __init__(self, bench_ref, text_col: str = "text", shingle_n: int = 5):
        import ray

        from .dedup import MinHasher

        self.bench = np.asarray(ray.get(bench_ref), dtype=np.uint64)  # sorted
        self.mh = MinHasher(text_col, num_perm=1, shingle_n=shingle_n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        hv, sc = self.mh._shingle_hashes(batch)
        ndocs = len(batch)
        out = np.zeros(ndocs, dtype=np.int64)
        if hv.size:
            doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), sc)
            # distinct (doc, shingle) pairs, then membership via searchsorted
            order = np.lexsort((hv, doc_of))
            d, h = doc_of[order], hv[order]
            first = np.ones(d.size, dtype=bool)
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
            d, h = d[first], h[first]
            pos = np.searchsorted(self.bench, h)
            ok = pos < self.bench.size
            ok[ok] = self.bench[pos[ok]] == h[ok]
            out = np.bincount(d[ok], minlength=ndocs).astype(np.int64)
        return batch.append_column("n_overlap", pa.array(out))


def decontaminate(ds, bench_ds, text_col: str = "text", shingle_n: int = 5):
    """Flag corpus docs sharing ≥1 token ``shingle_n``-gram with any
    benchmark doc.  Returns the input with an ``n_overlap`` column appended
    (0 = clean); callers typically ``filter`` on it."""
    import ray

    bench_ref = ray.put(benchmark_shingle_set(bench_ds, text_col, shingle_n))
    return ds.map_batches(
        Decontaminator,
        fn_constructor_args=(bench_ref, text_col, shingle_n),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


# ---- stratified sampling ---------------------------------------------------


def stratified_sample_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    base_permille: int = 100,
    spread_permille: int = 800,
) -> pa.Table:
    """Deterministic per-stratum downsampling: keep a row iff
    ``fnv1a(str(id)) % 1000 < base + fnv1a(stratum) % spread`` — every
    worker, every run, every engine (incl. the SQL oracle) selects the
    identical rows with zero coordination or state."""
    batch = strip_meta(batch)
    ids = batch[id_col]
    if not pa.types.is_string(ids.type):
        ids = pc.cast(ids, pa.string())
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    id_h = fnv1a_arrow(ids) % np.uint64(1000)
    strata = batch[strata_col]
    if isinstance(strata, pa.ChunkedArray):
        strata = strata.combine_chunks()
    enc = strata.dictionary_encode()
    dic_h = fnv1a_arrow(enc.dictionary) % np.uint64(spread_permille)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    rate = np.uint64(base_permille) + dic_h[codes]
    return batch.take(pa.array(np.flatnonzero(id_h < rate)))


# ---- repetition (Gopher-style) stats ---------------------------------------


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc repetition signals for boilerplate filtering: duplicate-token
    fraction (1 − unique/total) and duplicate-2-gram fraction — the
    Gopher-rules repetition family over a tokens-only corpus.  Appends raw
    float64 fractions (callers round for display/oracle parity)."""
    batch = strip_meta(batch)
    codes, doc_idx, dic, dl = arrow_tokens(batch[text_col])
    ndocs = len(batch)
    uniq = np.zeros(ndocs, dtype=np.int64)
    uniq2 = np.zeros(ndocs, dtype=np.int64)
    if codes.size:
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        first = np.ones(d.size, dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        uniq = np.bincount(d[first], minlength=ndocs).astype(np.int64)
        # adjacent-pair keys; pairs never span documents
        same_doc = doc_idx[1:] == doc_idx[:-1]
        if same_doc.any():
            v = np.int64(len(dic))
            pk = codes[:-1].astype(np.int64) * v + codes[1:].astype(np.int64)
            pd_, pk_ = doc_idx[:-1][same_doc], pk[same_doc]
            order = np.lexsort((pk_, pd_))
            d2, k2 = pd_[order], pk_[order]
            first = np.ones(d2.size, dtype=bool)
            first[1:] = (d2[1:] != d2[:-1]) | (k2[1:] != k2[:-1])
            uniq2 = np.bincount(d2[first], minlength=ndocs).astype(np.int64)
    tot2 = np.maximum(dl - 1, 0)
    dup_tok = np.where(dl > 0, 1.0 - uniq / np.maximum(dl, 1), 0.0)
    dup_2g = np.where(tot2 > 0, 1.0 - uniq2 / np.maximum(tot2, 1), 0.0)
    return (
        batch.append_column("n_tokens", pa.array(dl))
        .append_column("dup_token_frac", pa.array(dup_tok))
        .append_column("dup_2gram_frac", pa.array(dup_2g))
    )


# ---- sequence packing ------------------------------------------------------


def seqpack_windows(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    part_size: int = 1024,
):
    """Pack docs (in ``id_col`` order) into fixed token-budget training
    windows; a doc belongs to the window where it STARTS
    (``window = prefix_sum_before // budget``).

    Distributed exclusive prefix sum, the scan pattern that scales:

    1. one streaming pass computes per-doc token counts and reduces them to
       per-partition sums (``part = id // part_size``) — O(#parts) rows on
       the driver, never O(docs);
    2. partition offsets (cumsum of those sums) are broadcast; a
       ``groupby(part).map_groups`` pass re-derives the within-partition
       cumsum vectorized and adds the offset.

    Returns a Dataset of per-doc ``(doc_id, n_tokens, window)`` rows.
    The corpus text never moves through the shuffle — only the tiny
    (doc_id, n_tokens, part) triple does."""
    import ray.data as rd  # noqa: F401  (documents the Dataset dependency)

    def counts(batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        _c, _di, _dic, dl = arrow_tokens(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(dl),
                "part": pa.array(ids // np.int64(part_size)),
            }
        )

    counts_ds = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def part_sums(batch: pa.Table) -> pa.Table:
        g = batch.group_by("part").aggregate([("n_tokens", "sum")])
        return pa.table({"part": g["part"], "tok_p": g["n_tokens_sum"]})

    from ray.data.aggregate import Sum

    sums = (
        counts_ds.map_batches(part_sums, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Sum("tok_p", alias_name="tok"))
        .to_pandas()
        .sort_values("part")
    )
    parts = sums["part"].to_numpy(dtype=np.int64)
    totals = sums["tok"].to_numpy(dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    off_map = dict(zip(parts.tolist(), offsets.tolist()))

    def pack(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        base = off_map[part]
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        pre = base + np.concatenate(([0], np.cumsum(nt[order])[:-1]))
        win = pre // np.int64(budget)
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "n_tokens": pa.array(nt[order]),
                "window": pa.array(win),
            }
        )

    from .dedup import _snap_nonempty

    # snap: empty sort partitions skip the UDF and emit zero-column blocks
    # (Ray 2.49) that a downstream groupby/aggregate head warns about
    # ("RefBundle with a different schema") — the triples are tiny, so the
    # materialize barrier costs nothing
    return _snap_nonempty(
        counts_ds.groupby("part").map_groups(pack, batch_format="pyarrow"),
        pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "window": pa.array([], type=pa.int64()),
            }
        ),
    )


# ---- token-window chunking --------------------------------------------------

def chunk_token_windows(
    ds, text_col: str = "text", id_col: str = "doc_id", chunk: int = 64, stride: int = 48
):
    """Split documents into overlapping token windows — the doc→training-
    example step of a pretraining pipeline (context windows with
    ``chunk - stride`` tokens of overlap).

    Window spec (frozen, SQL-mirrored): window i covers tokens
    ``[i·stride, i·stride + chunk)`` for ``i·stride < max(L, 1)`` — every
    doc yields ≥ 1 window (an empty doc yields one empty chunk), trailing
    windows may be short.

    Fully vectorized: the ragged window→token index fan-out is the same
    repeat/arange machinery as the MinHash shingler, chunk text is
    assembled with one Arrow ``binary_join`` — no Python over tokens.
    A pure flat-map: no shuffle, streams at corpus scale.
    """
    from .hashing import ragged_arange

    def chunker(batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        codes, _doc_idx, dic, dl = arrow_tokens(batch[text_col])
        L = dl.astype(np.int64)
        eff = np.maximum(L, 1)
        w = ((eff + stride - 1) // stride).astype(np.int64)  # windows per doc
        chunk_idx = ragged_arange(w)
        starts_within = chunk_idx * stride
        L_rep = np.repeat(L, w)
        win_len = np.clip(L_rep - starts_within, 0, chunk)
        doc_starts = np.concatenate(([0], np.cumsum(L)[:-1]))
        win_tok_start = np.repeat(doc_starts, w) + starts_within
        flat_idx = np.repeat(win_tok_start, win_len) + ragged_arange(win_len)
        token_arr = dic.take(pa.array(codes, type=pa.int32()))
        win_tokens = token_arr.take(pa.array(flat_idx, type=pa.int64()))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(win_len))).astype(np.int32)
        )
        text = pc.binary_join(pa.ListArray.from_arrays(offsets, win_tokens), " ")
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, w)),
                "chunk_idx": pa.array(chunk_idx),
                "n_tokens": pa.array(win_len),
                "chunk_text": text,
            }
        )

    return ds.map_batches(chunker, batch_format="pyarrow")


def deterministic_shuffle(ds, id_col: str = "doc_id", seed: int = 42):
    """Seeded global permutation for training-order reproducibility: sort by
    FNV-1a of ``"{seed}:{id}"`` — the same corpus + seed always yields the
    same order on any cluster size (unlike ``random_shuffle``, which is
    placement-dependent).  One range-partitioned sort, no driver state."""

    def key_stage(t: pa.Table) -> pa.Table:
        t = strip_meta(t)
        ids = pc.cast(t[id_col], pa.string())
        keyed = pc.binary_join_element_wise(
            pa.scalar(f"{seed}"), ids, ":"
        )
        # mask to 63 bits (nonneg int64) — mirrored in SQL as % 2^63
        h = (fnv1a_arrow(keyed) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return t.append_column("__shuffle_key__", pa.array(h))

    return ds.map_batches(key_stage, batch_format="pyarrow").sort("__shuffle_key__")


def weighted_sample(ds, id_col: str, weight_col: str, k: int, seed: int = 11):
    """Deterministic weighted sampling without replacement (A-Res / Efraimidis-
    Spirakis): each row gets key = ln(u)/w with u a seeded FNV-derived uniform
    in (0, 1], and the k LARGEST keys win — inclusion probability ∝ weight,
    same sample on any cluster size (the weighted analog of
    :func:`deterministic_shuffle`).

    Scale shape: the key is a pure per-row map; a conservative per-block
    partial top-k (argpartition) reduces the global sort+limit to k·blocks
    candidate rows.  u = (fnv1a("{seed}:{id}") mod 2^53 + 1) / 2^53 — both
    the numerator and the power-of-two division are exact in float64, so the
    DuckDB mirror reproduces keys bit-for-bit before the round4 quantize.

    Precondition: weights must be strictly positive.  Rows with w <= 0 are
    dropped (they would yield -inf or NaN keys — NaN placement is undefined
    in the Arrow sort and diverges from the SQL mirror, whose ln(u)/0 is
    NULL); the SQL mirror applies the same ``WHERE w > 0`` filter.
    """

    def key_stage(t: pa.Table) -> pa.Table:
        t = strip_meta(t)
        w_all = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.any(~(w_all > 0.0)):
            t = t.take(pa.array(np.flatnonzero(w_all > 0.0)))
        ids = pc.cast(t[id_col], pa.string())
        keyed = pc.binary_join_element_wise(pa.scalar(f"{seed}"), ids, ":")
        h = (fnv1a_arrow(keyed) & np.uint64((1 << 53) - 1)).astype(np.float64)
        u = (h + 1.0) / float(1 << 53)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        key = np.log(u) / w
        key = np.floor(key * 10000 + 0.5) / 10000
        t = t.append_column("key", pa.array(key))
        if len(t) > k:
            # conservative per-block partial top-k in the FINAL total order
            # (key desc, id asc) — argpartition on key alone would break
            # boundary ties differently from the global sort
            ids_np = t[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids_np, -key))[:k]
            order.sort()
            t = t.take(pa.array(order))
        return t

    return (
        ds.map_batches(key_stage, batch_format="pyarrow")
        .sort(key=["key", id_col], descending=[True, False])
        .limit(k)
    )
