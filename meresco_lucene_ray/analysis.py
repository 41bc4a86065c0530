"""Text analysis: the frozen tokenizer spec shared by index, query and SQL oracle.

Reference behavior being re-expressed (NOT ported):
``MerescoStandardAnalyzer`` — ClassicTokenizer → ClassicFilter →
ASCIIFoldingFilter → LowerCaseFilter
(/root/reference/src/org/meresco/lucene/analysis/MerescoStandardAnalyzer.java:53-96).
The reference guarantees index-side and query-side tokenization agree; we keep
that guarantee by freezing ONE spec used everywhere, including the DuckDB
oracle SQL:

    tokens(text) = regexp findall of  [a-z0-9_]+  over lower(text)

(`_` is a letter for source code; accent folding is an optional extra pass via
``fold_ascii`` — off by default so the Python and SQL sides stay bit-identical.)

Everything here is pure Python/numpy — no Ray.  The hot path entry point is
``tokenize_batch`` which is called inside ``map_batches`` stages.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from collections.abc import Iterable, Sequence

TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# The SAME tokenizer, as a DuckDB SQL expression over a column reference.
# Keep in lockstep with TOKEN_PATTERN — the oracle gate depends on it.
SQL_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"


def fold_ascii(text: str) -> str:
    """ASCII-fold accents (NFKD strip of combining marks), like Lucene's
    ASCIIFoldingFilter in spirit (not bug-for-bug)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string per the frozen spec."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_batch(texts: Sequence[str | None]) -> list[list[str]]:
    """Tokenize a column of strings (one compiled-regex pass per row)."""
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t else [] for t in texts]


def arrow_tokens(col):
    """The frozen tokenizer spec evaluated entirely in Arrow C kernels —
    equivalent to ``tokenize_batch`` but with zero Python string objects.

    Returns ``(codes int32[], doc_idx int32[], dictionary StringArray,
    dl int64[])`` where ``dictionary[codes[i]]`` is the i-th token of the
    doc-contiguous token stream, ``doc_idx[i]`` its document, and ``dl`` the
    per-doc token counts.  Used by the dedup/textstats hot paths (the index
    build keeps its own fused copy in ``index/build.py``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    lower = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(lower, pattern="[^a-z0-9_]+")
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    values = lists.values
    n_per_doc = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(lists), dtype=np.int32), n_per_doc)
    nonempty = pc.not_equal(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(values.filter(pa.array(nonempty)))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[nonempty]
    dl = np.bincount(doc_idx, minlength=len(lists)).astype(np.int64)
    return codes, doc_idx, enc.dictionary, dl


def tokenize_whitespace(text: str | None) -> list[str]:
    """WhitespaceAnalyzer option (LuceneSettings.java:193-208): split on
    whitespace only, no lowercasing/folding."""
    return text.split() if text else []


def dutch_stem(word: str) -> str:
    """Simplified Dutch suffix stripper.  The reference uses the Snowball
    Dutch stemmer (MerescoDutchStemmingAnalyzer.java:49-66); this is a
    deliberately small approximation of its most common reductions — the
    MECHANISM (emit stemmed + original, dedup) is the parity target, not
    bug-for-bug snowball output."""
    for suf in ("heden", "eren", "tje", "en", "s"):
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: -len(suf)]
    return word


def make_tokenizer(
    kind: str = "standard",
    ascii_folding: bool = False,
    stem: str | None = None,
):
    """Tokenizer factory — the analyzer-strategy enum (M1/M2/M3).

    ``stem`` emits BOTH the original and the stemmed token when they differ
    (KeywordRepeatFilter → stemmer → RemoveDuplicatesTokenFilter semantics,
    MerescoDutchStemmingAnalyzer.java:49-66)."""
    base = tokenize if kind == "standard" else tokenize_whitespace
    stemmer = dutch_stem if stem == "dutch" else None

    def one(text: str | None) -> list[str]:
        if ascii_folding and text:
            text = fold_ascii(text)
        toks = base(text)
        if stemmer is None:
            return toks
        out: list[str] = []
        for t in toks:
            st = stemmer(t)
            out.append(t)
            if st != t:
                out.append(st)
        return out

    def many(texts: Sequence[str | None]) -> list[list[str]]:
        return [one(t) for t in texts]

    return many


def term_freqs(tokens: Iterable[str]) -> Counter:
    return Counter(tokens)


def token_positions(tokens: Sequence[str]) -> dict[str, list[int]]:
    """term -> sorted token positions (for phrase queries)."""
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        pos.setdefault(t, []).append(i)
    return pos


def word_shingles(tokens: Sequence[str], min_n: int = 2, max_n: int = 3) -> list[str]:
    """Word n-gram shingles, mirroring the suggestion ShingleAnalyzer semantics
    (/root/reference/src/org/meresco/lucene/suggestion/ShingleAnalyzer.java)."""
    out: list[str] = []
    L = len(tokens)
    for n in range(min_n, max_n + 1):
        for i in range(L - n + 1):
            out.append(" ".join(tokens[i : i + n]))
    return out


def char_ngrams(value: str, n: int, boundaries: bool = True) -> list[str]:
    """Character n-grams with ``$word$`` boundary markers, mirroring the
    autocomplete NGramAnalyzer + AddWordBoundaryFilter
    (/root/reference/src/org/meresco/lucene/suggestion/NGramAnalyzer.java)."""
    toks = tokenize(value)
    out: list[str] = []
    for w in toks:
        s = f"${w}$" if boundaries else w
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out
