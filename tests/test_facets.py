"""Hierarchical + multi-valued facets and path-prefix drilldown (Q9/Q10),
mirroring LuceneTest's flat/hierarchical facet assertions (F2)."""

import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ
from meresco_lucene_ray.query.ast import PathPrefixQ

ROWS = [
    ("id1", "value text one", ["first", "second"]),
    ("id2", "value text two", ["first", "other"]),
    ("id3", "value here", ["first"]),
    ("id4", "other body", ["second"]),
]


@pytest.fixture(scope="module")
def facet_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = pa.table(
        {
            "__id__": [r[0] for r in ROWS],
            "text": [r[1] for r in ROWS],
            "facet_path": pa.array([r[2] for r in ROWS], type=pa.list_(pa.string())),
            "tags": pa.array(
                [["a", "b"], ["b"], ["a"], ["c"]], type=pa.list_(pa.string())
            ),
        }
    )
    d = str(tmp_path_factory.mktemp("facets"))
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("facet_path", "tags"), num_shards=2
    )
    build_index(rd.from_arrow(t), d, cfg)
    return IndexSearcher(d, num_actors=1)


def test_hierarchical_facet_counts(facet_index):
    res = facet_index.execute(MatchAllQ(), stop=0, facets=[("facet_path", "hier")])
    counts = res.drilldown_data["facet_path"]
    # rollup: 'first' counts id1+id2+id3; leaf paths counted at depth 2
    assert counts["first"] == 3
    assert counts["second"] == 1  # top-level 'second' (id4)
    assert counts["first>second"] == 1
    assert counts["first>other"] == 1


def test_multivalued_facet_counts(facet_index):
    res = facet_index.execute(MatchAllQ(), stop=0, facets=[("tags", "multi")])
    assert res.drilldown_data["tags"] == {"a": 2, "b": 2, "c": 1}


def test_facet_of_matching_docs_only(facet_index):
    res = facet_index.execute(TermQ("value"), stop=0, facets=[("facet_path", "hier")])
    counts = res.drilldown_data["facet_path"]
    assert counts["first"] == 3 and "second" not in counts  # id4 doesn't match


def test_path_prefix_drilldown(facet_index):
    res = facet_index.execute(PathPrefixQ("facet_path", ("first",)), stop=10)
    assert sorted(res.ids()) == ["id1", "id2", "id3"]
    res2 = facet_index.execute(PathPrefixQ("facet_path", ("first", "second")), stop=10)
    assert res2.ids() == ["id1"]
    res3 = facet_index.execute(PathPrefixQ("facet_path", ("nope",)), stop=10)
    assert res3.total == 0


def test_fused_search_matches_separate_fanout(facet_index):
    """The fused one-pass top-k+facets path (engine execute with facets)
    must agree with the separate facet_counts fan-out and the facet-less
    top-k on the same query."""
    import ray

    q = TermQ("value")
    fused = facet_index.execute(
        q, stop=10, facets=[("facet_path", "hier"), ("tags", "multi")]
    )
    plain = facet_index.execute(q, stop=10)
    # hits identical to the unfused top-k
    assert fused.total == plain.total
    assert fused.hits.column("docid").to_pylist() == plain.hits.column("docid").to_pylist()
    assert fused.hits.column("score").to_pylist() == plain.hits.column("score").to_pylist()
    # facet counts identical to the separate per-actor facet_counts fan-out
    stats = facet_index._stats(q)
    for col, mode in (("facet_path", "hier"), ("tags", "multi")):
        agg = {}
        for part in ray.get(
            [
                a.facet_counts.remote(q, facet_index.sim, stats, col, mode)
                for a in facet_index.actors
            ]
        ):
            for v, c in part.items():
                agg[v] = agg.get(v, 0) + c
        assert fused.drilldown_data[col] == dict(
            sorted(agg.items(), key=lambda kv: (-kv[1], str(kv[0])))
        )


def test_fused_search_with_sort_and_paging(facet_index):
    res = facet_index.execute(
        MatchAllQ(),
        start=1,
        stop=3,
        sort=[("__id__", False, None)],
        facets=[("tags", "multi")],
        stored_fields=("__id__",),
    )
    assert res.hits.column("__id__").to_pylist() == ["id2", "id3"]
    assert res.drilldown_data["tags"] == {"a": 2, "b": 2, "c": 1}
