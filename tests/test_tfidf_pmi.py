"""TF-IDF keywords, unigram-LM surprisal and PMI collocations — the
corpus-statistics text operators (tfidf_top_terms / unigram_logprob /
collocations_pmi), verified against independent Python references."""

import math

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.functions.textstats import (
    _BigramRowsStage,
    _DocTermRowsStage,
    _topk_score_rows,
    collocations_pmi,
    tfidf_top_terms,
    unigram_logprob,
)

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat and dog and cat",
    "",
    "unique singleton words here",
]


def _r4(x):
    return math.floor(x * 10000 + 0.5) / 10000


def _tokenize(t):
    import re

    return re.findall(r"[a-z0-9_]+", t.lower())


def _docs_ds(texts=DOCS):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    )


def test_doc_term_rows_stage_counts():
    stage = _DocTermRowsStage("doc_id", "text")
    t = stage(pa.table({"doc_id": pa.array([7, 8], type=pa.int64()), "text": DOCS[:2]}))
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in t.to_pylist()}
    assert rows[(7, "the")] == (2, 6)
    assert rows[(7, "cat")] == (1, 6)
    assert rows[(8, "dog")] == (1, 6)
    assert len([k for k in rows if k[0] == 7]) == 5  # the cat sat on mat


def test_doc_term_rows_stage_empty_text():
    stage = _DocTermRowsStage("doc_id", "text")
    t = stage(pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": [""]}))
    assert len(t) == 0


def test_topk_score_rows_tie_by_term():
    t = pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "term": ["zebra", "apple", "mango", "solo"],
            "tf": pa.array([1, 1, 1, 1], type=pa.int64()),
            "score": [2.0, 2.0, 9.0, 1.0],
        }
    )
    out = _topk_score_rows(t, "doc_id", 2).to_pylist()
    got = [(r["doc_id"], r["term"]) for r in out]
    # doc 1: mango (9.0) then apple (tie at 2.0 broken by term asc)
    assert got == [(1, "mango"), (1, "apple"), (2, "solo")]


def _ref_tfidf(texts, k=3):
    toks = [_tokenize(t) for t in texts]
    n = float(len(texts))
    df = {}
    for ts in toks:
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    out = set()
    for i, ts in enumerate(toks):
        scored = []
        for w in set(ts):
            scored.append((_r4(ts.count(w) * math.log(n / df[w])), w))
        for s, w in sorted(scored, key=lambda x: (-x[0], x[1]))[:k]:
            out.add((i, w, toks[i].count(w), s))
    return out


def test_tfidf_matches_reference(ray_session):
    out = tfidf_top_terms(_docs_ds(), "text", "doc_id", k=3).to_pandas()
    got = set(zip(out["doc_id"], out["term"], out["tf"], out["score"]))
    assert got == _ref_tfidf(DOCS, 3)


def test_unigram_logprob_matches_reference(ray_session):
    out = unigram_logprob(_docs_ds(), "text", "doc_id").to_pandas()
    toks = [_tokenize(t) for t in DOCS]
    cf = {}
    for ts in toks:
        for w in ts:
            cf[w] = cf.get(w, 0) + 1
    n = float(sum(cf.values()))
    got = {(r.doc_id, r.n_tokens, r.mean_nll) for r in out.itertuples()}
    want = set()
    for i, ts in enumerate(toks):
        if not ts:
            continue  # empty docs produce no token rows
        mean = sum(math.log(n) - math.log(cf[w]) for w in ts) / len(ts)
        want.add((i, len(ts), _r4(mean)))
    assert got == want


def test_collocations_pmi_matches_reference(ray_session):
    texts = ["a b a b a b", "a b c d", "x y x y"] * 3
    out = collocations_pmi(_docs_ds(texts), "text", min_count=3, top=10).to_pandas()
    toks = [_tokenize(t) for t in texts]
    uni, big, npairs = {}, {}, 0
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            npairs += 1
    nt = float(sum(uni.values()))
    want = []
    for (a, b), c in big.items():
        if c < 3:
            continue
        pmi = _r4(
            math.log(c) - math.log(npairs) - math.log(uni[a]) - math.log(uni[b])
            + 2 * math.log(nt)
        )
        want.append((pmi, a, b, c))
    want = sorted(want, key=lambda x: (-x[0], x[1], x[2]))[:10]
    got = list(zip(out["pmi"], out["w1"], out["w2"], out["pair_cnt"]))
    assert got == want


def test_pmi_min_count_floor(ray_session):
    texts = ["p q", "p q", "r s"]  # (p,q) twice, (r,s) once
    out = collocations_pmi(_docs_ds(texts), "text", min_count=2, top=10).to_pandas()
    assert list(zip(out["w1"], out["w2"])) == [("p", "q")]
