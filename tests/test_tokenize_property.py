"""Property tests: the three tokenizer implementations agree (M1).

The frozen token spec has THREE live implementations that must stay in
lockstep: ``tokenize_batch`` (Python regex — the spec), ``arrow_tokens``
(Arrow C kernels — the index-build/dedup hot path), and ``SQL_TOKENIZE``
(DuckDB — the oracle gate's side of every driver correctness row).  A
divergence in any pair silently corrupts either the index or the
correctness gate, so hypothesis drives random unicode text (ASCII, accents,
case-folding edge codepoints, CJK, emoji, embedded NULs excluded by Arrow)
through all three and asserts identical token streams.

Plus: scalar ``levenshtein`` ≡ DuckDB's levenshtein on random string pairs
(the spell oracle's distance column), and separator/concatenation
invariants of the spec tokenizer.
"""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.analysis import (
    SQL_TOKENIZE,
    arrow_tokens,
    tokenize,
    tokenize_batch,
)
from meresco_lucene_ray.suggest.spell import levenshtein

# surrogates break Arrow/DuckDB UTF-8; NUL breaks C strings in duckdb params
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.one_of(st.none(), _TEXT), min_size=1, max_size=8))
def test_arrow_tokens_match_python_spec(texts):
    want = tokenize_batch(texts)
    codes, doc_idx, dictionary, dl = arrow_tokens(pa.array(texts, type=pa.string()))
    words = dictionary.to_pylist()
    got = [[] for _ in texts]
    for c, d in zip(codes.tolist(), doc_idx.tolist()):
        got[d].append(words[c])
    assert got == want, texts
    assert dl.tolist() == [len(t) for t in want]


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_sql_tokenize_matches_python_spec(texts):
    con = duckdb.connect()
    try:
        con.register("t", pa.table({"c": pa.array(texts, type=pa.string())}))
        got = con.execute(
            f"SELECT {SQL_TOKENIZE.format(col='c')} FROM t"
        ).fetchall()
    finally:
        con.close()
    assert [row[0] for row in got] == tokenize_batch(texts), texts


# the spell oracle compares distances over index terms only — ASCII by
# construction ([a-z0-9_]+).  On non-ASCII the two implementations diverge
# BY DESIGN: ours counts codepoints (DirectSpellChecker semantics), DuckDB
# counts UTF-8 bytes (levenshtein('', '\x80') == 2 there, 1 here).
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=40
)


@settings(max_examples=150, deadline=None)
@given(a=_ASCII, b=_ASCII)
def test_levenshtein_matches_duckdb_on_ascii(a, b):
    con = duckdb.connect()
    try:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    finally:
        con.close()
    assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_counts_codepoints_not_bytes():
    assert levenshtein("", "\x80") == 1  # one codepoint, two UTF-8 bytes
    assert levenshtein("café", "cafe") == 1


@settings(max_examples=100, deadline=None)
@given(a=_TEXT, b=_TEXT)
def test_tokenize_concatenation_invariant(a, b):
    # a space is a hard separator: tokenizing a joined string equals the
    # concatenation of the parts' tokens (the per-batch/per-shard split
    # points can never change the token stream)
    assert tokenize(a + " " + b) == tokenize(a) + tokenize(b)
    # idempotence: re-tokenizing the joined token stream is identity
    toks = tokenize(a)
    assert tokenize(" ".join(toks)) == toks
