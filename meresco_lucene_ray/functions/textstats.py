"""Text analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the frozen tokenizer
spec (analysis.SQL_TOKENIZE keeps the DuckDB oracle in lockstep).  Tokens are
dictionary-encoded in Arrow once per batch; only the small unique-token
dictionary is ever hashed or set-tested — zero Python per token.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokens
from .hashing import fnv1a_arrow, mersenne_addmod, mersenne_mulmod, strip_meta

# tiny multilingual stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "para", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "für", "von", "zu"},
}
QUALITY_STOPWORDS = sorted(STOPWORDS["en"])  # frozen list shared with the SQL oracle


def _unique_runs(codes: np.ndarray, doc_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(doc, code) of each distinct (doc, token) pair — one segmented sort."""
    if codes.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    n_dict = int(codes.max()) + 1
    key = doc_idx.astype(np.int64) * n_dict + codes.astype(np.int64)
    key.sort(kind="stable")
    first = np.ones(key.size, dtype=bool)
    first[1:] = key[1:] != key[:-1]
    uk = key[first]
    return uk // n_dict, uk % n_dict


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc token statistics: n_tokens, n_unique, avg token length."""
    batch = strip_meta(batch)
    codes, doc_idx, dic, dl = arrow_tokens(batch[text_col])
    ndocs = len(batch)
    run_doc, _ = _unique_runs(codes, doc_idx)
    nu = np.bincount(run_doc, minlength=ndocs).astype(np.int64)
    dict_lens = pc.utf8_length(dic).to_numpy(zero_copy_only=False).astype(np.float64)
    len_sum = np.bincount(doc_idx, weights=dict_lens[codes], minlength=ndocs)
    avg = np.divide(len_sum, dl, out=np.zeros(ndocs), where=dl > 0)
    return batch.append_column("n_tokens", pa.array(dl)).append_column(
        "n_unique", pa.array(nu)
    ).append_column("avg_token_len", pa.array(avg))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: token count, stopword ratio (frozen English list),
    alpha ratio.  A training-data filter stage."""
    batch = strip_meta(batch)
    codes, doc_idx, dic, dl = arrow_tokens(batch[text_col])
    ndocs = len(batch)
    in_sw = pc.is_in(dic, value_set=pa.array(QUALITY_STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    stop = np.bincount(doc_idx, weights=in_sw[codes].astype(np.float64), minlength=ndocs)
    ratio = stop / np.maximum(dl, 1)
    return batch.append_column("n_tokens", pa.array(dl)).append_column(
        "stopword_ratio", pa.array(ratio)
    )


class LangId:
    """Stopword-hit language heuristic (actor-pool stage: tables built once
    per actor).  Returns the language whose stopword list hits the most
    DISTINCT tokens; 'und' when nothing hits.  Ties go to the first language
    in sorted order (the round-1 iteration order)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(STOPWORDS)
        self.tables = [pa.array(sorted(STOPWORDS[lang])) for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        codes, doc_idx, dic, _dl = arrow_tokens(batch[self.text_col])
        ndocs = len(batch)
        run_doc, run_code = _unique_runs(codes, doc_idx)
        hits = np.zeros((len(self.langs), ndocs), dtype=np.int64)
        for li, vs in enumerate(self.tables):
            in_lang = pc.is_in(dic, value_set=vs).to_numpy(zero_copy_only=False)
            if run_code.size:
                hits[li] = np.bincount(
                    run_doc, weights=in_lang[run_code].astype(np.float64), minlength=ndocs
                ).astype(np.int64)
        best = hits.argmax(axis=0)  # first max on ties == sorted-lang order
        best_n = hits.max(axis=0) if ndocs else np.zeros(0, dtype=np.int64)
        lang_arr = np.asarray(self.langs, dtype=object)
        preds = np.where(best_n > 0, lang_arr[best], "und")
        return batch.append_column("lang_pred", pa.array(preds.tolist(), type=pa.string()))


FINGERPRINT_MOD = (1 << 61) - 1
FINGERPRINT_BASE = 1_000_003


# GPT-2-style pretokenizer, RE2-safe (no lookahead — RE2 has none; the
# `\s+(?!\S)` refinement is dropped, trailing-space chunks merge into one
# \s+ token).  Arrow and DuckDB both run RE2, so counts match exactly.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc BPE-ish token count — the training-cost estimator: a BPE
    vocabulary splits on (then merges within) exactly these pretoken
    chunks, so the chunk count is the tight upper bound on real tokenizer
    output and the standard budget proxy when the merges table isn't
    shipped with the pipeline."""
    batch = strip_meta(batch)
    n = pc.count_substring_regex(batch[text_col], BPE_PRETOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic rolling polynomial hash over the token stream — a
    document fingerprint robust to whitespace/punctuation differences.

    Vectorized Horner evaluation: docs are length-sorted and the update
    h = (h·BASE + fnv32(token)) mod (2^61−1) runs once per token POSITION
    over the active-doc prefix — bit-identical to the round-1 per-token
    Python loop."""
    batch = strip_meta(batch)
    codes, _doc_idx, dic, dl = arrow_tokens(batch[text_col])
    ndocs = len(batch)
    out = np.zeros(ndocs, dtype=np.uint64)
    if codes.size:
        c_occ = (fnv1a_arrow(dic) & np.uint64(0xFFFFFFFF))[codes]
        doc_starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
        order = np.argsort(-dl, kind="stable")
        s_dl = dl[order]
        s_start = doc_starts[order]
        h = np.zeros(ndocs, dtype=np.uint64)
        max_dl = int(s_dl[0])
        active = np.searchsorted(-s_dl, -np.arange(max_dl, dtype=np.int64), side="left")
        base = np.uint64(FINGERPRINT_BASE)
        for pos in range(max_dl):
            m = active[pos]
            if m == 0:
                break
            c = c_occ[s_start[:m] + pos]
            h[:m] = mersenne_addmod(mersenne_mulmod(h[:m], base), c)
        out[order] = h
    return batch.append_column("fingerprint", pa.array(out.astype(np.int64)))


def hash_str(s: str) -> int:
    """Deterministic 64-bit FNV-1a (PYTHONHASHSEED-independent) — the scalar
    reference for hashing.fnv1a_arrow (kept for tests and small-input code)."""
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# ---------- corpus-frequent shingle (boilerplate) fraction -------------------

class _ShingleRowsStage:
    """map_batches stage: explode each doc to its DISTINCT word n-gram
    shingle hashes — one (id, h) row per distinct shingle, vectorized
    (segmented lexsort + run detection, no Python over tokens)."""

    def __init__(self, id_col: str, text_col: str, n: int):
        from .dedup import MinHasher

        self.id_col = id_col
        self._mh = MinHasher(text_col, num_perm=1, shingle_n=n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import strip_meta

        batch = strip_meta(batch)
        hv, sc = self._mh._shingle_hashes(batch)
        doc_of = np.repeat(np.arange(sc.size, dtype=np.int64), sc)
        order = np.lexsort((hv, doc_of))
        d_s, h_s = doc_of[order], hv[order]
        first = np.ones(h_s.size, dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d_s[first]]),
                "h": pa.array(h_s[first].astype(np.int64)),
            }
        )


def common_shingle_frac(ds, text_col: str = "text", id_col: str = "doc_id", n: int = 2, min_df: int = 3):
    """Boilerplate detection: per doc, the fraction of its distinct word
    n-gram shingles that are corpus-frequent (document frequency ≥ min_df)
    — the RefinedWeb/Gopher-style cross-document repetition signal that
    catches license headers, generated scaffolding and template text.

    Scale shape: docs explode ONCE to distinct (id, shingle-hash) rows; a
    groupby(h) count (Ray partial-combines per block) produces the document
    frequencies, which are hash-JOINED back onto the rows — everything is
    keyed on the shingle hash, no broadcast frequency table, no driver
    state.  A final groupby(id) folds (total, common) per doc.

    Returns a Dataset of (doc_id, total_shingles, common_shingles, frac).
    """
    from ray.data.aggregate import Count, Sum

    from .dedup import _snap_nonempty
    from .hashing import cached_stage

    def rows_stage(batch: pa.Table) -> pa.Table:
        return cached_stage(_ShingleRowsStage, id_col, text_col, n)(batch)

    rows = _snap_nonempty(
        ds.map_batches(rows_stage, batch_format="pyarrow"),
        pa.table({"doc_id": pa.array([], type=pa.int64()), "h": pa.array([], type=pa.int64())}),
    )
    dfreq = _snap_nonempty(
        rows.groupby("h").aggregate(Count(alias_name="df")),
        pa.table({"h": pa.array([], type=pa.int64()), "df": pa.array([], type=pa.int64())}),
    )
    from .joins import attach_small

    joined = attach_small(rows, dfreq, "h", ["df"])

    def mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "is_common": pc.cast(
                    pc.greater_equal(t["df"], pa.scalar(min_df, type=pa.int64())), pa.int64()
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        total = t["count()"] if "count()" in t.column_names else t["total"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "total_shingles": total,
                "common_shingles": t["common"],
                "frac": pc.divide(
                    pc.cast(t["common"], pa.float64()), pc.cast(total, pa.float64())
                ),
            }
        )

    return (
        joined.map_batches(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="total"), Sum("is_common", alias_name="common"))
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------- TF-IDF keywords / unigram LM / collocations -----------------------

class _DocTermRowsStage:
    """map_batches stage: explode docs to (id, term, tf, dl) rows — one row
    per distinct (doc, term), vectorized (dictionary codes + one segmented
    ``np.unique``, no Python over tokens).  The shared front half of the
    TF-IDF / unigram-LM family; every downstream stat is a groupby or hash
    join keyed on ``term``."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis import arrow_tokens

        batch = strip_meta(batch)
        codes, doc_idx, dic, dl = arrow_tokens(batch[self.text_col])
        if codes.size == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=batch[self.id_col].type),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                }
            )
        n_dict = len(dic)
        key = doc_idx.astype(np.int64) * n_dict + codes.astype(np.int64)
        uk, tf = np.unique(key, return_counts=True)
        d = (uk // n_dict).astype(np.int64)
        c = (uk % n_dict).astype(np.int32)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                self.id_col: ids.take(pa.array(d)),
                "term": pc.take(dic, pa.array(c)),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(np.asarray(dl, dtype=np.int64)[d]),
            }
        )


def _topk_score_rows(t: pa.Table, id_col: str, k: int) -> pa.Table:
    """Per-group head-k by (score desc, term asc): ONE Arrow C sort over
    (id, -score, term), then a numpy run-rank on the group column — no
    per-row Python compares (np.lexsort on string columns would be one)."""
    if len(t) == 0:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[(id_col, "ascending"), ("score", "descending"), ("term", "ascending")],
    )
    t2 = t.take(idx)
    d = t2[id_col].to_numpy(zero_copy_only=False)
    starts = np.ones(len(d), dtype=bool)
    starts[1:] = d[1:] != d[:-1]
    run_start = np.flatnonzero(starts)
    run_id = np.cumsum(starts) - 1
    rank = np.arange(len(d)) - run_start[run_id]
    return t2.filter(pa.array(rank < k))


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Per-doc top-k terms by TF-IDF (score = tf · ln(n/df), ties broken by
    term) — the classic keyword-extraction operator.

    Scale shape: docs explode ONCE to (id, term, tf) rows; document
    frequencies come from a groupby(term) count (Ray partial-combines per
    block) and are hash-JOINED back on ``term`` — no broadcast vocabulary,
    no driver state.  After the join a doc's rows are scattered across
    partitions, so top-k runs twice: a conservative map-side partial per
    block (any block's per-doc top-k superset-contains the global one),
    then the exact per-group final — only k·blocks candidate rows reach
    the last shuffle.  Score is quantized to 4 decimals BEFORE ranking so
    the ordering is reproducible across summation orders (and mirrors the
    DuckDB oracle bit-for-bit).
    """
    from ray.data.aggregate import Count

    from .dedup import _snap_nonempty
    from .hashing import cached_stage

    n_docs = float(ds.count())

    def rows_stage(batch: pa.Table) -> pa.Table:
        return cached_stage(_DocTermRowsStage, id_col, text_col)(batch)

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "dl": pa.array([], type=pa.int64()),
        }
    )
    rows = _snap_nonempty(ds.map_batches(rows_stage, batch_format="pyarrow"), empty)
    dfreq = _snap_nonempty(
        rows.groupby("term").aggregate(Count(alias_name="df")),
        pa.table({"term": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())}),
    )
    from .joins import attach_small

    joined = attach_small(rows, dfreq, "term", ["df"])

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf * np.log(n_docs / df)
        s = np.floor(s * 10000 + 0.5) / 10000  # quantize BEFORE ranking
        out = t.select([id_col, "term", "tf"])
        return out.append_column("score", pa.array(s))

    def partial(t: pa.Table) -> pa.Table:
        return _topk_score_rows(t, id_col, k)

    def final(t: pa.Table) -> pa.Table:
        return _topk_score_rows(t, id_col, k)

    cand = (
        joined.map_batches(score, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    # The map-side partial leaves ≤ k·docs·blocks candidate rows.  When that
    # survivor set is small, ONE coalesced exact pass replaces the
    # groupby(id) sort-shuffle (_topk_score_rows is per-id over the whole
    # table, so the single pass IS the exact final); past the gate the
    # shuffle is the scale path (k·docs rows is unbounded at 100 TB).
    coalesce_gate = int(os.environ.get("MLR_TOPK_COALESCE_MAX", 2_000_000))
    if cand.count() <= coalesce_gate:
        return cand.repartition(1).map_batches(
            final, batch_format="pyarrow", batch_size=None
        )
    return cand.groupby(id_col).map_groups(final, batch_format="pyarrow")


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc mean unigram surprisal (mean over tokens of ln(N/cf), N =
    corpus token count, cf = the token's collection frequency) — the cheap
    corpus-self-trained LM quality score (CCNet-style perplexity filtering's
    little sibling): low = templated/common text, high = rare-token soup.

    Same shape as :func:`tfidf_top_terms`: one explode, one groupby(term)
    Sum for collection frequencies, one hash join back on term, one
    groupby(id) fold — everything keyed on ``term`` / ``id``, nothing
    driver-side but two scalar aggregates.
    """
    from ray.data.aggregate import Sum

    from .dedup import _snap_nonempty
    from .hashing import cached_stage

    def rows_stage(batch: pa.Table) -> pa.Table:
        return cached_stage(_DocTermRowsStage, id_col, text_col)(batch)

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "dl": pa.array([], type=pa.int64()),
        }
    )
    rows = _snap_nonempty(ds.map_batches(rows_stage, batch_format="pyarrow"), empty)
    cf = _snap_nonempty(
        rows.groupby("term").aggregate(Sum("tf", alias_name="cf")),
        pa.table({"term": pa.array([], type=pa.string()), "cf": pa.array([], type=pa.int64())}),
    )
    # Dataset.sum returns None on an empty dataset — guard so an empty/too-
    # small corpus yields the empty result table instead of a TypeError.
    n_tokens = float(cf.sum("cf") or 0)
    if n_tokens == 0.0:
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "mean_nll": pa.array([], type=pa.float64()),
                }
            )
        )
    from .joins import attach_small

    joined = attach_small(rows, cf, "term", ["cf"])

    def nll(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["cf"].to_numpy(zero_copy_only=False).astype(np.float64)
        # tf · (ln N − ln cf): composed EXACTLY like the SQL mirror
        v = tf * (np.log(n_tokens) - np.log(c))
        return pa.table({id_col: t[id_col], "nll": pa.array(v), "tf": t["tf"]})

    def finish(t: pa.Table) -> pa.Table:
        s = t["nll"].to_numpy(zero_copy_only=False)
        n = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = np.floor(s / n * 10000 + 0.5) / 10000
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pc.cast(t["tf"], pa.int64()),
                "mean_nll": pa.array(mean),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        joined.map_batches(nll, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(_Sum("nll", alias_name="nll"), _Sum("tf", alias_name="tf"))
        .map_batches(finish, batch_format="pyarrow")
    )


class _BigramRowsStage:
    """map_batches stage: per-batch partial bigram counts (w1, w2, cnt) over
    adjacent in-doc token pairs — vectorized (code-pair keys + np.unique)."""

    def __init__(self, text_col: str):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis import arrow_tokens

        batch = strip_meta(batch)
        codes, doc_idx, dic, _dl = arrow_tokens(batch[self.text_col])
        if codes.size < 2:
            return pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        adj = doc_idx[1:] == doc_idx[:-1]
        a = codes[:-1][adj].astype(np.int64)
        b = codes[1:][adj].astype(np.int64)
        n_dict = len(dic)
        uk, cnt = np.unique(a * n_dict + b, return_counts=True)
        return pa.table(
            {
                "w1": pc.take(dic, pa.array((uk // n_dict).astype(np.int32))),
                "w2": pc.take(dic, pa.array((uk % n_dict).astype(np.int32))),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def collocations_pmi(ds, text_col: str = "text", min_count: int = 25, top: int = 20):
    """Corpus-level collocations: top-N adjacent-token bigrams by pointwise
    mutual information, pmi = ln(cnt) − ln(Np) − ln(c1) − ln(c2) + 2·ln(Nt)
    (cnt = bigram count, Np = total pairs, c1/c2 = unigram counts, Nt =
    total tokens), with a min-count support floor.

    Scale shape: map-side partial bigram counts per block (np.unique over
    code pairs — the combiner) → ONE groupby(w1,w2) sum; the support floor
    prunes the long tail BEFORE the two small hash joins that attach
    unigram counts, so the scored set is tiny; the final top-N is a sort
    over that pruned set only.  ln terms are composed in the exact same
    order as the DuckDB mirror so round4(pmi) is reproducible.
    """
    from ray.data.aggregate import Sum

    from .dedup import _snap_nonempty
    from .hashing import cached_stage

    def rows_stage(batch: pa.Table) -> pa.Table:
        return cached_stage(_BigramRowsStage, text_col)(batch)

    def uni_stage(batch: pa.Table) -> pa.Table:
        from ..analysis import arrow_tokens

        batch = strip_meta(batch)
        codes, _doc_idx, dic, _dl = arrow_tokens(batch[text_col])
        if codes.size == 0:
            return pa.table(
                {"w": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}
            )
        uk, c = np.unique(codes, return_counts=True)
        return pa.table(
            {
                "w": pc.take(dic, pa.array(uk.astype(np.int32))),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    pairs = _snap_nonempty(
        ds.map_batches(rows_stage, batch_format="pyarrow"),
        pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        ),
    )
    big = _snap_nonempty(
        pairs.groupby(["w1", "w2"]).aggregate(Sum("cnt", alias_name="cnt")),
        pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        ),
    )
    # Dataset.sum returns None on an empty dataset — guard both scalars so a
    # too-small corpus yields the empty result table, not a TypeError.
    n_pairs = float(big.sum("cnt") or 0)
    uni = _snap_nonempty(
        ds.map_batches(uni_stage, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c")),
        pa.table({"w": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}),
    )
    n_tokens = float(uni.sum("c") or 0)
    if n_pairs == 0.0 or n_tokens == 0.0:
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "pair_cnt": pa.array([], type=pa.int64()),
                    "pmi": pa.array([], type=pa.float64()),
                }
            )
        )

    def floor_(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["cnt"], pa.scalar(min_count, type=pa.int64())))

    supported = _snap_nonempty(
        big.map_batches(floor_, batch_format="pyarrow"),
        pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        ),
    )

    if supported.count() == 0:
        # every bigram fell below the support floor — short-circuit before
        # the joins (an all-empty left side still loses its key columns in
        # Ray 2.49's hash join)
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "pair_cnt": pa.array([], type=pa.int64()),
                    "pmi": pa.array([], type=pa.float64()),
                }
            )
        )

    from .joins import broadcast_attach, gather_small_ref, partitions_for

    bcast_gate = int(os.environ.get("MLR_ATTACH_BCAST_MAX", 5_000_000))
    if uni.count() <= bcast_gate:
        # ONE broadcast unigram payload, probed twice under different roles
        # (w1→c1, w2→c2) — zero shuffle where the join path pays two
        uni_ref = gather_small_ref(uni, ["w", "c"])
        j1 = broadcast_attach(
            supported, "w", uni_ref, ["c"], probe_col="w1", out_cols=["c1"]
        )
        joined = broadcast_attach(
            j1, "w", uni_ref, ["c"], probe_col="w2", out_cols=["c2"]
        )
    else:

        def as_u1(t: pa.Table) -> pa.Table:
            return t.rename_columns(["w1", "c1"])

        def as_u2(t: pa.Table) -> pa.Table:
            return t.rename_columns(["w2", "c2"])

        # snap between the chained joins: a zero-row join partition carries a
        # ZERO-COLUMN block, and the second join's aggregator then fails with
        # "No match ... FieldRef.Name(w2) on left side" (same Ray 2.49 issue
        # _snap_nonempty exists for; bites whenever partitions outnumber rows)
        np_join = partitions_for(supported, uni)
        j1 = _snap_nonempty(
            supported.join(
                uni.map_batches(as_u1, batch_format="pyarrow"),
                join_type="inner",
                num_partitions=np_join,
                on=("w1",),
            ),
            pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                    "c1": pa.array([], type=pa.int64()),
                }
            ),
        )
        joined = j1.join(
            uni.map_batches(as_u2, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=np_join,
            on=("w2",),
        )

    def score(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = (
            np.log(cnt) - np.log(n_pairs) - np.log(c1) - np.log(c2) + 2.0 * np.log(n_tokens)
        )
        pmi = np.floor(pmi * 10000 + 0.5) / 10000
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"], "pair_cnt": t["cnt"], "pmi": pa.array(pmi)}
        )

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(key=["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(top)
    )
