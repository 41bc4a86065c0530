"""Stored-column prefixSearch pushdown (Lucene.java:629-666 over doc values):
only the prefix range ships from each segment, with live-doc filtering and
the same keys/counts the MatchAll-facet path produced — including
hierarchical '>'-joined rollup keys for taxonomy columns."""

import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import delete_documents
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ


@pytest.fixture()
def stored_index(ray_session, tmp_path):
    import ray.data as rd

    rows = {
        "__id__": [f"d{i}" for i in range(8)],
        "content": [f"alpha doc{i}" for i in range(8)],
        "lang": ["en", "en", "eo", "de", "de", "de", None, "en"],
        "size": [10, 20, 10, 30, 10, 20, 10, 10],  # non-string scalar
        "cat": [
            ["a", "x"],
            ["a", "x"],
            ["a", "y"],
            ["ab", "z"],
            ["b", "z"],
            None,
            ["a"],
            ["a", "x"],
        ],
    }
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        text_col="content",
        id_col="__id__",
        stored_cols=("lang", "size", "cat"),
        num_shards=2,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return d


def test_scalar_prefix_counts(stored_index):
    s = IndexSearcher(stored_index, num_actors=2, num_cpus=0.25)
    assert s.prefix_search("e", limit=10, field="lang") == [("en", 3), ("eo", 1)]
    assert s.prefix_search("en", limit=10, field="lang") == [("en", 3)]
    assert s.prefix_search("", limit=2, field="lang") == [("de", 3), ("en", 3)]
    assert s.prefix_search("zz", limit=10, field="lang") == []


def test_non_string_scalar_returns_empty(stored_index):
    # the former driver-side filter dropped non-str values; pushdown agrees
    s = IndexSearcher(stored_index, num_actors=2, num_cpus=0.25)
    assert s.prefix_search("1", limit=10, field="size") == []


def test_hierarchical_rollup_prefix(stored_index):
    s = IndexSearcher(stored_index, num_actors=2, num_cpus=0.25)
    # rollup keys: 'a'(5 docs), 'ab'(1), 'b'(1) plus depth-2 'a>x'(3) etc.
    got = dict(s.prefix_search("a", limit=100, field="cat"))
    assert got == {"a": 5, "ab": 1, "a>x": 3, "a>y": 1, "ab>z": 1}
    # '>'-crossing prefix hits only deeper rollup keys
    assert s.prefix_search("a>", limit=100, field="cat") == [("a>x", 3), ("a>y", 1)]


def test_component_containing_separator(ray_session, tmp_path):
    """A path COMPONENT may itself contain '>': depth-1 key 'a>b' must match
    prefix 'a>' (the former depth prune skipped depth 1 for '>'-bearing
    prefixes and silently dropped it)."""
    import ray.data as rd

    t = pa.table(
        {
            "__id__": ["x0", "x1"],
            "content": ["alpha", "beta"],
            "cat": pa.array([["a>b"], ["a", "x"]], type=pa.list_(pa.string())),
        }
    )
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        text_col="content", id_col="__id__", stored_cols=("cat",), num_shards=1
    )
    build_index(rd.from_arrow(t), d, cfg)
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    assert dict(s.prefix_search("a>", limit=10, field="cat")) == {
        "a>b": 1,
        "a>x": 1,
    }
    # and it still agrees with the MatchAll-facet reference path
    res = s.execute(MatchAllQ(), stop=0, facets=["cat"])
    want = {
        v: c
        for v, c in res.drilldown_data["cat"].items()
        if isinstance(v, str) and v.startswith("a>")
    }
    assert dict(s.prefix_search("a>", limit=10, field="cat")) == want


def test_matches_matchall_facet_path(stored_index):
    """The pushdown must be value-identical to the facet machinery it
    replaced: MatchAll facet counts filtered by prefix driver-side."""
    s = IndexSearcher(stored_index, num_actors=2, num_cpus=0.25)
    for field, prefix in [("lang", ""), ("lang", "e"), ("cat", ""), ("cat", "a")]:
        res = s.execute(MatchAllQ(), stop=0, facets=[field])
        want = sorted(
            (
                (v, c)
                for v, c in res.drilldown_data.get(field, {}).items()
                if isinstance(v, str) and v.startswith(prefix)
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert s.prefix_search(prefix, limit=1000, field=field) == want


def test_live_doc_filtering(stored_index, ray_session):
    delete_documents(stored_index, ["d0", "d3"])
    s = IndexSearcher(stored_index, num_actors=2, num_cpus=0.25)
    assert s.prefix_search("", limit=10, field="lang") == [
        ("de", 2),
        ("en", 2),
        ("eo", 1),
    ]
    got = dict(s.prefix_search("a", limit=100, field="cat"))
    assert got == {"a": 4, "a>x": 2, "a>y": 1}


def test_segment_valve_truncation(stored_index):
    """The per-segment safety valve reports truncation only when matching
    values were dropped, mirroring prefix_terms' signal."""
    from meresco_lucene_ray.query.segment import SegmentSearcher

    seg_dirs = IndexSearcher(stored_index, num_actors=1, num_cpus=0.25)
    seg = SegmentSearcher(f"{stored_index}/{seg_dirs.manifest.segments[0].path}")
    full, trunc_full = seg.stored_prefix_counts("lang", "", 100)
    assert not trunc_full
    capped, truncated = seg.stored_prefix_counts("lang", "", 1)
    assert truncated and len(capped) == 1
    # capped output is a subset of the full counts
    assert all(full[k] == v for k, v in capped.items())
