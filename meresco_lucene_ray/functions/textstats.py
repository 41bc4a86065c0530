"""Text analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the frozen tokenizer
spec (analysis.SQL_TOKENIZE keeps the DuckDB oracle in lockstep).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import tokenize_batch

# tiny multilingual stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "para", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "für", "von", "zu"},
}
QUALITY_STOPWORDS = sorted(STOPWORDS["en"])  # frozen list shared with the SQL oracle


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc token statistics: n_tokens, n_unique, avg token length."""
    toks = tokenize_batch(batch[text_col].to_pylist())
    n = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    nu = np.fromiter((len(set(t)) for t in toks), dtype=np.int64, count=len(toks))
    avg = np.asarray(
        [float(np.mean([len(w) for w in t])) if t else 0.0 for t in toks], dtype=np.float64
    )
    return batch.append_column("n_tokens", pa.array(n)).append_column(
        "n_unique", pa.array(nu)
    ).append_column("avg_token_len", pa.array(avg))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: token count, stopword ratio (frozen English list),
    alpha ratio.  A training-data filter stage."""
    texts = batch[text_col].to_pylist()
    toks = tokenize_batch(texts)
    sw = set(QUALITY_STOPWORDS)
    n = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    stop = np.fromiter(
        (sum(1 for w in t if w in sw) for t in toks), dtype=np.int64, count=len(toks)
    )
    ratio = np.divide(stop, np.maximum(n, 1), dtype=np.float64)
    return batch.append_column("n_tokens", pa.array(n)).append_column(
        "stopword_ratio", pa.array(ratio)
    )


class LangId:
    """Stopword-hit language heuristic (actor-pool stage: tables built once
    per actor).  Returns the language whose stopword list hits most tokens;
    'und' when nothing hits."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch[self.text_col].to_pylist())
        langs = []
        for t in toks:
            s = set(t)
            best, best_n = "und", 0
            for lang in sorted(self.tables):
                hits = len(s & self.tables[lang])
                if hits > best_n:
                    best, best_n = lang, hits
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


FINGERPRINT_MOD = (1 << 61) - 1
FINGERPRINT_BASE = 1_000_003


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic rolling polynomial hash over the token stream — a
    document fingerprint robust to whitespace/punctuation differences."""
    toks = tokenize_batch(batch[text_col].to_pylist())
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = 0
        for w in t:
            h = (h * FINGERPRINT_BASE + (hash_str(w) & 0xFFFFFFFF)) % FINGERPRINT_MOD
        out[i] = h
    return batch.append_column("fingerprint", pa.array(out.astype(np.int64)))


def hash_str(s: str) -> int:
    """Deterministic 64-bit FNV-1a (PYTHONHASHSEED-independent)."""
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
