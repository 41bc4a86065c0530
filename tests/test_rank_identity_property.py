"""Property test: rank identity on RANDOM corpora.

The fixed-corpus rank-identity tests (test_index_query.py) exercise one
token distribution; hypothesis here generates adversarial tiny corpora —
every doc drawn from a 6-word vocabulary, so term stats collide (equal
tf, equal dl, df ∈ {0 … N}), empty documents, single-doc indexes — and
asserts the engine's FULL ranking (docids AND float32-quantized scores)
matches the independent brute-force BM25 oracle for OR / AND / phrase
queries over every vocabulary term pair.

Each example builds a real sharded index through the full Ray pipeline,
so examples are few and documents small."""

import shutil
import uuid

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import BoolQ, IndexSearcher, PhraseQ, TermQ
from meresco_lucene_ray.query.oracle import BruteForceIndex

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=25,
)


def _sorted_hits(pairs):
    return sorted(pairs, key=lambda x: (-round(x[1], 9), x[0]))


def _engine_top(searcher, q, k):
    res = searcher.execute(q, stop=k)
    return _sorted_hits(
        zip(res.hits["__id__"].to_pylist(), res.hits["score"].to_pylist())
    )


def _assert_same(engine, oracle_hits):
    oracle_hits = _sorted_hits(oracle_hits)
    assert [i for i, _ in engine] == [i for i, _ in oracle_hits]
    for (_, s1), (_, s2) in zip(engine, oracle_hits):
        assert s1 == pytest.approx(s2, abs=1e-9)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_random_corpus_rank_identity(ray_session, docs):
    import ray.data as rd

    ids = [f"d{i:03d}" for i in range(len(docs))]
    texts = [" ".join(d) for d in docs]
    ds = rd.from_arrow(
        pa.table({"__id__": pa.array(ids), "content": pa.array(texts)})
    )
    idx_dir = f"/tmp/mlr_rankprop/{uuid.uuid4().hex}"
    try:
        cfg = IndexConfig(
            text_col="content", id_col="__id__", num_shards=2, store_positions=True
        )
        build_index(ds, idx_dir, cfg)
        searcher = IndexSearcher(idx_dir, num_actors=2)
        oracle = BruteForceIndex(ids, texts)
        k = len(docs) + 1  # full ranking, not just a prefix
        for a, b in [("alpha", "beta"), ("gamma", "eps"), ("zeta", "delta")]:
            _assert_same(
                _engine_top(searcher, TermQ(a), k), oracle.top_k_or([a], k)
            )
            _assert_same(
                _engine_top(searcher, BoolQ(should=(TermQ(a), TermQ(b))), k),
                oracle.top_k_or([a, b], k),
            )
            _assert_same(
                _engine_top(searcher, BoolQ(must=(TermQ(a), TermQ(b))), k),
                oracle.top_k_and([a, b], k),
            )
            _assert_same(
                _engine_top(searcher, PhraseQ([a, b]), k),
                oracle.top_k_phrase([a, b], k),
            )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


_DOCS2 = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10),
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS2)
def test_random_corpus_field_scoped_rank_identity(ray_session, docs):
    """Field-scoped twin of the rank-identity oracle: random TWO-field
    corpora (body default + title \x1f-prefixed), asserting field-scoped
    term/OR/AND/phrase rankings match a brute-force oracle built over ONLY
    that field's texts (per-field df/dl; avgdl = field sum_dl / total N —
    the engine's per-field-stats contract), and that a cross-field
    conjunction scores as the sum of the two fields' oracles."""
    import ray.data as rd

    ids = [f"d{i:03d}" for i in range(len(docs))]
    bodies = [" ".join(b) for b, _ in docs]
    titles = [" ".join(t) for _, t in docs]
    ds = rd.from_arrow(
        pa.table(
            {
                "__id__": pa.array(ids),
                "body": pa.array(bodies),
                "title": pa.array(titles),
            }
        )
    )
    idx_dir = f"/tmp/mlr_rankprop2/{uuid.uuid4().hex}"
    try:
        cfg = IndexConfig(
            text_col="body",
            id_col="__id__",
            text_fields=("title",),
            num_shards=2,
            store_positions=True,
        )
        build_index(ds, idx_dir, cfg)
        with IndexSearcher(idx_dir, num_actors=2) as searcher:
            o_body = BruteForceIndex(ids, bodies)
            o_title = BruteForceIndex(ids, titles)
            k = len(docs) + 1
            for a, b in [("alpha", "beta"), ("zeta", "gamma")]:
                _assert_same(
                    _engine_top(searcher, TermQ(a, field="title"), k),
                    o_title.top_k_or([a], k),
                )
                _assert_same(
                    _engine_top(
                        searcher,
                        BoolQ(should=(TermQ(a, field="title"), TermQ(b, field="title"))),
                        k,
                    ),
                    o_title.top_k_or([a, b], k),
                )
                _assert_same(
                    _engine_top(
                        searcher,
                        BoolQ(must=(TermQ(a, field="title"), TermQ(b, field="title"))),
                        k,
                    ),
                    o_title.top_k_and([a, b], k),
                )
                _assert_same(
                    _engine_top(searcher, PhraseQ([a, b], field="title"), k),
                    o_title.top_k_phrase([a, b], k),
                )
                # cross-field AND: matches docs hit in BOTH fields; score is
                # the sum of each field's independent BM25 contribution,
                # float64 throughout with ONE final f32 rounding (the
                # engine's score_f32 contract, same as the oracle's top_k_*)
                want = [
                    (
                        ids[i],
                        float(
                            np.float32(
                                o_body.score_term(i, a) + o_title.score_term(i, b)
                            )
                        ),
                    )
                    for i in range(len(ids))
                    if o_body.matches_term(i, a) and o_title.matches_term(i, b)
                ]
                _assert_same(
                    _engine_top(
                        searcher,
                        BoolQ(must=(TermQ(a), TermQ(b, field="title"))),
                        k,
                    ),
                    want,
                )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
