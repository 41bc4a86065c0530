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
