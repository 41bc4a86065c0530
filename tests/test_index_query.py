"""End-to-end: build index on the synthetic corpus, assert rank-identity
against the brute-force oracle, the sha256 ingest invariant, and the
reference's golden BM25 value."""

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meresco_lucene_ray.corpus import corpus_batch, synthesize_corpus
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import (
    BM25,
    BoolQ,
    DocValEqQ,
    IndexSearcher,
    MatchAllQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    TermQ,
    WildcardQ,
)
from meresco_lucene_ray.query.oracle import BruteForceIndex

N_DOCS = 400


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    idx_dir = str(tmp_path_factory.mktemp("idx"))
    ds = synthesize_corpus(N_DOCS, seed=42, parallelism=4)
    cfg = IndexConfig(
        text_col="content",
        id_from=("repo", "path", "commit"),
        stored_cols=("lang", "repo"),
        num_shards=4,
        store_positions=True,
        hash_content=True,
    )
    manifest = build_index(ds, idx_dir, cfg)
    searcher = IndexSearcher(idx_dir, num_actors=2)
    t = corpus_batch(np.arange(N_DOCS))
    ids = [
        f"{r}:{p}:{c}"
        for r, p, c in zip(*(t[c].to_pylist() for c in ("repo", "path", "commit")))
    ]
    oracle = BruteForceIndex(ids, t["content"].to_pylist())
    return idx_dir, manifest, searcher, oracle, t


def test_manifest_counts(built):
    idx_dir, manifest, searcher, oracle, t = built
    assert manifest.num_docs == N_DOCS
    assert manifest.sum_dl == sum(oracle.dl)
    assert searcher.num_docs() == N_DOCS


def test_sha256_ingest_invariant(built):
    idx_dir, manifest, searcher, oracle, t = built
    want = {
        f"{r}:{p}:{c}": hashlib.sha256(content.encode()).hexdigest()
        for r, p, c, content in zip(
            *(t[c].to_pylist() for c in ("repo", "path", "commit", "content"))
        )
    }
    got = {}
    for f in glob.glob(os.path.join(idx_dir, "segments", "*", "docs.parquet")):
        dt = pq.read_table(f, columns=["__id__", "content_sha256"])
        got.update(zip(dt["__id__"].to_pylist(), dt["content_sha256"].to_pylist()))
    assert got == want


def _engine_top(searcher, q, k=10):
    res = searcher.execute(q, stop=k)
    ids = res.hits["__id__"].to_pylist()
    scores = res.hits["score"].to_pylist()
    out = sorted(zip(ids, scores), key=lambda x: (-round(x[1], 9), x[0]))
    return out, res.total


def _check_rank_identity(engine_hits, oracle_hits):
    oracle_hits = sorted(oracle_hits, key=lambda x: (-round(x[1], 9), x[0]))
    assert [i for i, _ in engine_hits] == [i for i, _ in oracle_hits]
    for (i1, s1), (i2, s2) in zip(engine_hits, oracle_hits):
        assert s1 == pytest.approx(s2, abs=1e-9), (i1, i2)


@pytest.mark.parametrize("term", ["def", "import", "return", "v100", "v999"])
def test_single_term_rank_identity(built, term):
    _, _, searcher, oracle, _ = built
    hits, total = _engine_top(searcher, TermQ(term))
    want = oracle.top_k_or([term], k=10)
    assert total == sum(1 for tf in oracle.tfs if term in tf)
    _check_rank_identity(hits, want)


def test_bool_or_rank_identity(built):
    _, _, searcher, oracle, _ = built
    q = BoolQ(should=(TermQ("lambda"), TermQ("yield"), TermQ("v55")))
    hits, _ = _engine_top(searcher, q)
    _check_rank_identity(hits, oracle.top_k_or(["lambda", "yield", "v55"], k=10))


def test_bool_and_rank_identity(built):
    _, _, searcher, oracle, _ = built
    q = BoolQ(must=(TermQ("def"), TermQ("import")))
    hits, _ = _engine_top(searcher, q)
    _check_rank_identity(hits, oracle.top_k_and(["def", "import"], k=10))


def test_bool_not(built):
    _, _, searcher, oracle, _ = built
    q = BoolQ(must=(TermQ("def"),), must_not=(TermQ("v55"),))
    _, total = _engine_top(searcher, q)
    want = sum(1 for tf in oracle.tfs if "def" in tf and "v55" not in tf)
    assert total == want


def test_phrase_rank_identity(built):
    _, _, searcher, oracle, _ = built
    q = PhraseQ(("def", "the"))
    hits, total = _engine_top(searcher, q)
    want = oracle.top_k_phrase(("def", "the"), k=10)
    assert total == sum(1 for i in range(oracle.N) if oracle.phrase_freq(i, ("def", "the")) > 0)
    assert total > 0, "fixture should contain the phrase"
    _check_rank_identity(hits, want)


def test_prefix_and_wildcard(built):
    _, _, searcher, oracle, _ = built
    _, total = _engine_top(searcher, PrefixQ("v1"))
    want = sum(1 for tf in oracle.tfs if any(t.startswith("v1") for t in tf))
    assert total == want
    _, total_w = _engine_top(searcher, WildcardQ("v1*"))
    assert total_w == want


def test_docval_eq_and_matchall(built):
    _, _, searcher, oracle, t = built
    langs = t["lang"].to_pylist()
    _, total = _engine_top(searcher, DocValEqQ("lang", "py"))
    assert total == sum(1 for l in langs if l == "py")
    _, total_all = _engine_top(searcher, MatchAllQ())
    assert total_all == N_DOCS


def test_filter_clause_does_not_score(built):
    _, _, searcher, oracle, _ = built
    q1 = BoolQ(must=(TermQ("def"),), filter=(DocValEqQ("lang", "py"),))
    res = searcher.execute(q1, stop=5)
    # scores must equal pure term scores (filter adds no score)
    for i, s in zip(res.hits["__id__"].to_pylist(), res.hits["score"].to_pylist()):
        oi = oracle.ids.index(i)
        assert s == pytest.approx(oracle.score_term(oi, "def"), rel=1e-6)


def test_facets(built):
    _, _, searcher, oracle, t = built
    res = searcher.execute(MatchAllQ(), facets=["lang"])
    langs = t["lang"].to_pylist()
    want = {}
    for l in langs:
        want[l] = want.get(l, 0) + 1
    assert res.drilldown_data["lang"] == dict(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    )


def test_paging(built):
    _, _, searcher, _, _ = built
    full = searcher.execute(TermQ("def"), start=0, stop=20)
    page = searcher.execute(TermQ("def"), start=5, stop=15)
    assert page.hits["__id__"].to_pylist() == full.hits["__id__"].to_pylist()[5:15]
    empty = searcher.execute(TermQ("def"), start=7, stop=7)
    assert len(empty.hits) == 0  # start==stop edge case (Lucene.java:420,558-565)


def test_prefix_search_terms(built):
    _, _, searcher, oracle, _ = built
    got = searcher.prefix_search("v1", limit=5)
    want = {}
    for tf in oracle.tfs:
        for term in tf:
            if term.startswith("v1"):
                want[term] = want.get(term, 0) + 1
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == expect


def test_golden_bm25_single_doc(ray_session, tmp_path):
    """Reference golden: N=1, df=1, tf=1, dl=avgdl, k1=1.2, b=0.75 →
    0.13076457381248474 (test/_integration/luceneservertest.py)."""
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"__id__": ["d1"], "content": ["hello"]})
    )
    cfg = IndexConfig(text_col="content", id_col="__id__", num_shards=1, k1=1.2, b=0.75)
    build_index(ds, str(tmp_path), cfg)
    s = IndexSearcher(str(tmp_path), similarity=BM25(k1=1.2, b=0.75))
    res = s.execute(TermQ("hello"))
    assert res.hits["score"][0].as_py() == pytest.approx(0.13076457381248474, abs=1e-12)


def test_resume_skips_complete_segments(built, tmp_path):
    """Second build with identical config/input reuses segments (lineage)."""
    idx_dir, manifest, _, _, _ = built
    seg = glob.glob(os.path.join(idx_dir, "segments", "*", "postings.parquet"))[0]
    mtime = os.path.getmtime(seg)
    ds = synthesize_corpus(N_DOCS, seed=42, parallelism=4)
    cfg = IndexConfig(
        text_col="content",
        id_from=("repo", "path", "commit"),
        stored_cols=("lang", "repo"),
        num_shards=4,
        store_positions=True,
        hash_content=True,
    )
    m2 = build_index(ds, idx_dir, cfg)
    assert os.path.getmtime(seg) == mtime  # untouched → resumed
    assert m2.num_docs == manifest.num_docs
