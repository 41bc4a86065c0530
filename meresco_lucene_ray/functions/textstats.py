"""Text analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the frozen tokenizer
spec (analysis.SQL_TOKENIZE keeps the DuckDB oracle in lockstep).  Tokens are
dictionary-encoded in Arrow once per batch; only the small unique-token
dictionary is ever hashed or set-tested — zero Python per token.
"""

from __future__ import annotations

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
    joined = rows.join(dfreq, join_type="inner", num_partitions=8, on=("h",))

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
