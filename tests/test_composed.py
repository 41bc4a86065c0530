"""Multi-core composed queries (MultiLuceneTest-style fixture, FIXTURES.md F3).

Three small cores joined by an integer key space; expectations computed by a
straightforward independent Python reimplementation inside the test."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.join import ComposedQuery, KeyBits, MultiSearcher
from meresco_lucene_ray.query import DocValEqQ, IndexSearcher, MatchAllQ, TermQ

KEY_SPACE = 32

# coreA: 8 docs keyed 1..8, flags M/Q/U from the id suffix (MultiLuceneTest.java:82-96)
A_ROWS = [
    ("A", 1), ("A-U", 2), ("A-Q", 3), ("A-QU", 4),
    ("A-M", 5), ("A-MU", 6), ("A-MQ", 7), ("A-MQU", 8),
]
# coreB: 11 docs with keys overlapping A's space, flags N/O/P, sort T + intField
B_ROWS = [
    ("B-1", 5, "true", "false", "A", 11), ("B-2", 6, "true", "true", "B", 10),
    ("B-3", 7, "true", "false", "C", 9), ("B-4", 8, "false", "true", "D", 8),
    ("B-5", 9, "false", "false", "E", 7), ("B-6", 10, "true", "true", "F", 6),
    ("B-7", 11, "true", "false", "G", 5), ("B-8", 5, "false", "true", "H", 4),
    ("B-9", 6, "false", "false", "I", 3), ("B-10", 7, "true", "true", "J", 2),
    ("B-11", 12, "true", "false", "K", 1),
]
C_ROWS = [("C-R", 5, "true"), ("C-S", 8, "false"), ("C-S2", 7, "true")]


def _flags(id_):
    suffix = id_.split("-")[1] if "-" in id_ else ""
    return {f: ("true" if f in suffix else "false") for f in "MQU"}


@pytest.fixture(scope="module")
def cores(ray_session, tmp_path_factory):
    import ray.data as rd

    dirs = {}
    a = pa.table(
        {
            "__id__": [i for i, _ in A_ROWS],
            "text": [f"doc {i.lower()}" for i, _ in A_ROWS],
            "key": pa.array([k for _, k in A_ROWS], type=pa.int64()),
            "M": [_flags(i)["M"] for i, _ in A_ROWS],
            "Q": [_flags(i)["Q"] for i, _ in A_ROWS],
            "U": [_flags(i)["U"] for i, _ in A_ROWS],
            "S": [str(n) for n in range(1, 9)],
        }
    )
    b = pa.table(
        {
            "__id__": [r[0] for r in B_ROWS],
            "text": [f"doc {r[0].lower()}" for r in B_ROWS],
            "key": pa.array([r[1] for r in B_ROWS], type=pa.int64()),
            "N": [r[2] for r in B_ROWS],
            "O": [r[3] for r in B_ROWS],
            "T": [r[4] for r in B_ROWS],
            "intField": pa.array([r[5] for r in B_ROWS], type=pa.int64()),
        }
    )
    c = pa.table(
        {
            "__id__": [r[0] for r in C_ROWS],
            "text": [f"doc {r[0].lower()}" for r in C_ROWS],
            "key": pa.array([r[1] for r in C_ROWS], type=pa.int64()),
            "R": [r[2] for r in C_ROWS],
        }
    )
    searchers = {}
    for name, tbl, stored in (
        ("coreA", a, ("key", "M", "Q", "U", "S")),
        ("coreB", b, ("key", "N", "O", "T", "intField")),
        ("coreC", c, ("key", "R")),
    ):
        d = str(tmp_path_factory.mktemp(name))
        cfg = IndexConfig(text_col="text", id_col="__id__", stored_cols=stored, num_shards=2)
        build_index(rd.from_arrow(tbl), d, cfg)
        searchers[name] = IndexSearcher(d, num_actors=1)
    ms = MultiSearcher(searchers, KEY_SPACE)
    ms.matches = {}
    return ms


def _cq(**kw):
    base = dict(
        result_core="coreA",
        matches={("coreA", "coreB"): ("key", "key"), ("coreA", "coreC"): ("key", "key")},
        stop=20,
    )
    base.update(kw)
    return ComposedQuery(**base)


def test_single_core_shortcut(cores):
    res = cores.execute(_cq(queries={"coreA": DocValEqQ("Q", "true")}))
    assert res.total == 4
    assert sorted(res.ids()) == ["A-MQ", "A-MQU", "A-Q", "A-QU"]


def test_join_filter(cores):
    # coreA filtered by coreB.N=true over the key match (J1+J2)
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ(), "coreB": DocValEqQ("N", "true")},
        )
    )
    b_keys = {r[1] for r in B_ROWS if r[2] == "true"}
    expect = sorted(i for i, k in A_ROWS if k in b_keys)
    assert sorted(res.ids()) == expect


def test_join_filter_with_result_query(cores):
    res = cores.execute(
        _cq(queries={"coreA": DocValEqQ("M", "true"), "coreB": DocValEqQ("N", "true")})
    )
    b_keys = {r[1] for r in B_ROWS if r[2] == "true"}
    expect = sorted(
        i for i, k in A_ROWS if k in b_keys and _flags(i)["M"] == "true"
    )
    assert sorted(res.ids()) == expect


def test_exclude_filter(cores):
    # J8: exclude coreA docs whose key matches coreB.O=true
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ()},
            exclude_filter_queries={"coreB": [DocValEqQ("O", "true")]},
        )
    )
    o_keys = {r[1] for r in B_ROWS if r[3] == "true"}
    expect = sorted(i for i, k in A_ROWS if k not in o_keys)
    assert sorted(res.ids()) == expect


def test_unite(cores):
    # J4: keys(coreA.Q=true) OR keys(coreB.N=true)
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ()},
            unites=[(("coreA", DocValEqQ("Q", "true")), ("coreB", DocValEqQ("N", "true")))],
        )
    )
    q_keys = {k for i, k in A_ROWS if _flags(i)["Q"] == "true"}
    n_keys = {r[1] for r in B_ROWS if r[2] == "true"}
    expect = sorted(i for i, k in A_ROWS if k in (q_keys | n_keys))
    assert sorted(res.ids()) == expect


def test_rank_query_blending(cores):
    # J5: MatchAll on coreA (own score 1.0) blended with coreB.N=true rank
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ()},
            rank_queries={"coreB": DocValEqQ("N", "true")},
            rank_ratio=0.4,
        )
    )
    n_keys = {r[1] for r in B_ROWS if r[2] == "true"}
    scores = dict(zip(res.ids(), res.hits["score"].to_pylist()))
    for i, k in A_ROWS:
        want = (1 - 0.4) * 1.0 + 0.4 * ((1.0 + 1.0) if k in n_keys else 1.0)
        assert scores[i] == pytest.approx(want, rel=1e-3), i
    # blended docs rank first
    ranked = res.ids()
    boosted = {i for i, k in A_ROWS if k in n_keys}
    assert set(ranked[: len(boosted)]) == boosted


def test_join_sort(cores):
    # J6: sort coreA by coreB.intField (other-core column)
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ(), "coreB": MatchAllQ()},
            sort_by_other=("coreB", "intField", False),
        )
    )
    # expected: coreA docs with matching B keys, sorted by min... last-write-wins
    # key->intField (docid order across B segments); compute via the same map
    vals = cores.cores["coreB"].key_value_array("key", "intField", KEY_SPACE)
    b_keys = {r[1] for r in B_ROWS}
    expect = sorted(
        (i for i, k in A_ROWS if k in b_keys),
        key=lambda i: vals[dict(A_ROWS)[i]],
    )
    assert res.ids() == expect


def test_other_core_facets(cores):
    res = cores.execute(
        _cq(
            queries={"coreA": DocValEqQ("M", "true"), "coreB": DocValEqQ("N", "true")},
            facets={"coreB": ["N"]},
        )
    )
    assert "coreB.N" in res.drilldown_data
    # facet counts = coreB docs whose key is in the RESULT core's key set
    b_keys = {r[1] for r in B_ROWS if r[2] == "true"}
    result_keys = {k for i, k in A_ROWS if k in b_keys and _flags(i)["M"] == "true"}
    want: dict[str, int] = {}
    for r in B_ROWS:
        if r[1] in result_keys:
            want[r[2]] = want.get(r[2], 0) + 1
    assert res.drilldown_data["coreB.N"] == dict(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    )


def test_export_keys(cores):
    res = cores.execute(
        _cq(
            queries={"coreA": DocValEqQ("Q", "true"), "coreB": MatchAllQ()},
            export_keys=True,
        )
    )
    kb = res.drilldown_data["__exported_keys__"]
    assert isinstance(kb, KeyBits)
    b_keys = {r[1] for r in B_ROWS}
    expect_keys = {k for i, k in A_ROWS if _flags(i)["Q"] == "true" and k in b_keys}
    assert set(np.flatnonzero(kb.materialize()).tolist()) == expect_keys
    # round-trip serialization (exportKeys wire format analog)
    packed = kb.pack()
    assert KeyBits.unpack(packed, KEY_SPACE).materialize().tolist() == kb.materialize().tolist()


def test_join_query_three_cores(cores):
    """testJoinQueryThreeCores (MultiLuceneTest): result core filtered by
    BOTH other cores' filter queries simultaneously."""
    res = cores.execute(
        _cq(
            queries={"coreA": MatchAllQ()},
            filter_queries={
                "coreB": [DocValEqQ("N", "true")],
                "coreC": [DocValEqQ("R", "true")],
            },
        )
    )
    # B.N=true keys: {5,6,7,10,11,12}; C.R=true keys: {5,7}
    # A docs keyed 5 or 7 → A-M (5), A-MQ (7)
    assert sorted(res.ids()) == ["A-M", "A-MQ"]


def test_join_query_on_optional_key(ray_session, tmp_path, cores):
    """testJoinQueryOnOptionalKey: docs with a NULL key never match a key
    filter (and never crash the int cast path)."""
    import ray.data as rd

    t = pa.table(
        {
            "__id__": ["d0", "d1", "d2"],
            "text": ["word", "word", "word"],
            "key": pa.array([1, None, 2], type=pa.int64()),
        }
    )
    d = str(tmp_path / "optkey")
    build_index(
        rd.from_arrow(t),
        d,
        IndexConfig(text_col="text", id_col="__id__", stored_cols=("key",), num_shards=1),
    )
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    ms = MultiSearcher({"main": s, "other": cores.cores["coreB"]}, KEY_SPACE)
    cq = ComposedQuery(
        result_core="main",
        matches={("main", "other"): ("key", "key")},
        queries={"main": TermQ("word"), "other": MatchAllQ()},
        stop=10,
    )
    res = ms.execute(cq)
    # d1's NULL key matches nothing (and doesn't crash the int cast path);
    # the others match iff their key exists in coreB (keys 5..12)
    b_keys = {r[1] for r in B_ROWS}
    expect = sorted(
        i for i, k in (("d0", 1), ("d2", 2)) if k in b_keys
    )
    assert sorted(res.ids()) == expect


def test_key_filter_ignores_out_of_bounds_keys(ray_session, tmp_path):
    """testKeyFilterIgnoresKeysOutOfBoundsOfKeySet: key values beyond the
    bitset length are silently non-matching."""
    import ray.data as rd

    from meresco_lucene_ray.query import KeyFilterQ

    t = pa.table(
        {
            "__id__": ["in", "out"],
            "text": ["word", "word"],
            "key": pa.array([2, 1000], type=pa.int64()),  # 1000 >> bitset size
        }
    )
    d = str(tmp_path / "oob")
    build_index(
        rd.from_arrow(t),
        d,
        IndexConfig(text_col="text", id_col="__id__", stored_cols=("key",), num_shards=1),
    )
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    bits = np.zeros(8, dtype=bool)
    bits[2] = True
    from meresco_lucene_ray.query import BoolQ

    res = s.execute(BoolQ(must=(TermQ("word"),), filter=(KeyFilterQ("key", bits),)), stop=10)
    assert res.ids() == ["in"]
    # inverted: out-of-bounds keys DO pass an exclusion (they're not in the set)
    res2 = s.execute(
        BoolQ(must=(TermQ("word"),), filter=(KeyFilterQ("key", bits, inverted=True),)),
        stop=10,
    )
    assert res2.ids() == ["out"]
