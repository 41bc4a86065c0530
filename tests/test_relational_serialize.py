"""J7 relational algebra (with pushdown) + query wire-format round-trip."""

import json

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.join import RelAnd, RelLeaf, RelNot, RelOr, RelationalRunner
from meresco_lucene_ray.join.composed import ComposedQuery, MultiSearcher
from meresco_lucene_ray.query import DocValEqQ, IndexSearcher, MatchAllQ
from meresco_lucene_ray.query.ast import (
    BoolQ,
    GeoDistanceQ,
    KeyFilterQ,
    PathPrefixQ,
    PhraseQ,
    RangeQ,
    TermQ,
)
from meresco_lucene_ray.query.serialize import query_from_dict, query_to_dict

KEY_SPACE = 16

# coreA: keys 1..6 with flag M; coreB: keys 3..8 with flag N
A = [(f"a{k}", k, "true" if k % 2 == 0 else "false") for k in range(1, 7)]
B = [(f"b{k}", k, "true" if k <= 5 else "false") for k in range(3, 9)]


@pytest.fixture(scope="module")
def runner(ray_session, tmp_path_factory):
    import ray.data as rd

    searchers = {}
    for name, rows, flag in (("A", A, "M"), ("B", B, "N")):
        t = pa.table(
            {
                "__id__": [r[0] for r in rows],
                "text": [f"doc {r[0]}" for r in rows],
                "key": pa.array([r[1] for r in rows], type=pa.int64()),
                flag: [r[2] for r in rows],
            }
        )
        d = str(tmp_path_factory.mktemp(name))
        build_index(
            rd.from_arrow(t),
            d,
            IndexConfig(text_col="text", id_col="__id__", stored_cols=("key", flag), num_shards=1),
        )
        searchers[name] = IndexSearcher(d, num_actors=1)
    return RelationalRunner(searchers, KEY_SPACE), searchers


def _keys(bits):
    return set(np.flatnonzero(bits.materialize()).tolist())


def test_leaf_and_pushdown(runner):
    r, _ = runner
    leafA = RelLeaf("A", "key", "key", DocValEqQ("M", "true"))
    leafB = RelLeaf("B", "key", "key", DocValEqQ("N", "true"))
    a_keys = {k for _, k, m in A if m == "true"}
    b_keys = {k for _, k, n in B if n == "true"}
    assert _keys(r.execute(leafA)) == a_keys
    # AND: pushdown — second scan filtered by first's keys
    assert _keys(r.execute(RelAnd(leafA, leafB))) == (a_keys & b_keys)
    assert _keys(r.execute(RelOr(leafA, leafB))) == (a_keys | b_keys)


def test_not_lazy_inversion(runner):
    r, _ = runner
    leafA = RelLeaf("A", "key", "key", DocValEqQ("M", "true"))
    leafB = RelLeaf("B", "key", "key", DocValEqQ("N", "true"))
    a_keys = {k for _, k, m in A if m == "true"}
    b_keys = {k for _, k, n in B if n == "true"}
    got = _keys(r.execute(RelAnd(leafA, RelNot(leafB))))
    assert got == (a_keys - b_keys)


def test_relational_filter_in_composed(runner):
    r, searchers = runner
    ms = MultiSearcher(searchers, KEY_SPACE)
    expr = RelAnd(
        RelLeaf("A", "key", "key", DocValEqQ("M", "true")),
        RelLeaf("B", "key", "key", DocValEqQ("N", "true")),
    )
    cq = ComposedQuery(
        result_core="A",
        queries={"A": MatchAllQ()},
        matches={("A", "B"): ("key", "key")},
        relational_filter=expr,
        stop=20,
    )
    res = ms.execute(cq)
    want_keys = {k for _, k, m in A if m == "true"} & {k for _, k, n in B if n == "true"}
    assert sorted(res.ids()) == sorted(i for i, k, _ in A if k in want_keys)


# ---- wire format ------------------------------------------------------------

def test_query_roundtrip_all_nodes():
    bits = np.zeros(8, dtype=bool)
    bits[[1, 5]] = True
    q = BoolQ(
        must=(TermQ("a", boost=2.0), PhraseQ(("x", "y"))),
        should=(RangeQ("n", 1, 9, True, False), DocValEqQ("lang", "en")),
        must_not=(PathPrefixQ("p", ("r", "s")),),
        filter=(
            GeoDistanceQ("lat", "lon", 52.0, 4.9, 1000.0),
            KeyFilterQ("key", bits, inverted=True),
        ),
        boost=1.5,
    )
    d = query_to_dict(q)
    json.dumps(d)  # must be JSON-safe
    q2 = query_from_dict(d)
    assert q2.must == q.must
    assert q2.should == q.should
    assert q2.must_not == q.must_not
    assert q2.boost == q.boost
    kf = q2.filter[1]
    assert kf.inverted is True
    assert np.array_equal(kf.bitset, bits)


def test_roundtrip_preserves_search_results(runner, ray_session):
    _, searchers = runner
    q = BoolQ(must=(TermQ("doc"),), filter=(DocValEqQ("M", "true"),))
    q2 = query_from_dict(json.loads(json.dumps(query_to_dict(q))))
    r1 = searchers["A"].execute(q, stop=10)
    r2 = searchers["A"].execute(q2, stop=10)
    assert r1.ids() == r2.ids()
    assert r1.hits["score"].to_pylist() == r2.hits["score"].to_pylist()


def test_relational_wire_roundtrip():
    # Rel* nodes (incl. nested query ASTs) survive the JSON wire format
    expr = RelAnd(
        RelLeaf("A", "key", "key", DocValEqQ("M", "true")),
        RelNot(RelLeaf("B", "key", "key", BoolQ(must=(TermQ("doc"),)))),
    )
    d = json.loads(json.dumps(query_to_dict(expr)))
    assert query_from_dict(d) == expr


def test_relational_filter_json_in_composed(runner):
    # relationalFilterJson: the JSON-string wire form parses at execute time
    # (ComposedQuery.relationalFilterJson, MultiLucene.java:100-116)
    r, searchers = runner
    ms = MultiSearcher(searchers, KEY_SPACE)
    expr = RelAnd(
        RelLeaf("A", "key", "key", DocValEqQ("M", "true")),
        RelLeaf("B", "key", "key", DocValEqQ("N", "true")),
    )
    cq = ComposedQuery(
        result_core="A",
        queries={"A": MatchAllQ()},
        matches={("A", "B"): ("key", "key")},
        relational_filter_json=json.dumps(query_to_dict(expr)),
        stop=20,
    )
    cq.validate()
    res = ms.execute(cq)
    want_keys = {k for _, k, m in A if m == "true"} & {k for _, k, n in B if n == "true"}
    assert sorted(res.ids()) == sorted(i for i, k, _ in A if k in want_keys)


def test_relational_filter_json_reference_dialect(runner):
    # the same filter in the REFERENCE's JsonQueryConverter dialect
    # (RelationalLuceneQuery/JoinAndQuery, JsonQueryConverter.java:238-276)
    # parses identically at execute time
    r, searchers = runner
    ms = MultiSearcher(searchers, KEY_SPACE)
    wire = {
        "type": "JoinAndQuery",
        "first": {
            "type": "RelationalLuceneQuery", "core": "A",
            "collectKeyName": "key", "filterKeyName": "key",
            "query": {"type": "TermQuery", "term": {"field": "M", "value": "true"}},
        },
        "second": {
            "type": "RelationalLuceneQuery", "core": "B",
            "collectKeyName": "key", "filterKeyName": "key",
            "query": {"type": "TermQuery", "term": {"field": "N", "value": "true"}},
        },
    }
    cq = ComposedQuery(
        result_core="A",
        queries={"A": MatchAllQ()},
        matches={("A", "B"): ("key", "key")},
        relational_filter_json=json.dumps(wire),
        stop=20,
    )
    cq.validate()
    res = ms.execute(cq)
    want_keys = {k for _, k, m in A if m == "true"} & {k for _, k, n in B if n == "true"}
    assert sorted(res.ids()) == sorted(i for i, k, _ in A if k in want_keys)
