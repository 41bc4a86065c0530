"""Dedup combined with FIELD SORT (DeDupFilterSuperCollector delegating to a
TopFieldSuperCollector — DeDupFilterSuperCollector.java:43-258) and the
drilldownFieldnames taxonomy children listing (Lucene.java:692-713)."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ


@pytest.fixture(scope="module")
def grouped_index(ray_session, tmp_path_factory):
    import ray.data as rd

    n = 24
    rows = {
        "__id__": [f"d{i:03d}" for i in range(n)],
        "text": ["common word%d" % i for i in range(n)],
        "grp": [f"g{i % 5}" for i in range(n)],
        "prio": pa.array([(i * 7) % 23 for i in range(n)], type=pa.int64()),
        "name": pa.array(
            [None if i % 6 == 0 else f"n{(i * 3) % 17:02d}" for i in range(n)],
            type=pa.string(),
        ),
        "cat": pa.array(
            [["top", f"mid{i % 3}", f"leaf{i % 4}"] for i in range(n)],
            type=pa.list_(pa.string()),
        ),
    }
    d = str(tmp_path_factory.mktemp("ddsort") / "idx")
    cfg = IndexConfig(
        text_col="text",
        id_col="__id__",
        stored_cols=("grp", "prio", "name", "cat"),
        num_shards=3,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return d, rows


def test_dedup_with_field_sort(grouped_index):
    d, rows = grouped_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    res = s.execute(
        TermQ("common"),
        stop=5,
        dedup_field="grp",
        dedup_sort_field="prio",
        sort=[("prio", True, None)],
        stored_fields=("prio",),
    )
    assert res.total == 5
    assert res.total_with_duplicates == 24
    # expected: representative per group = max prio doc; groups ordered by
    # representative prio desc
    prios = [int(x) for x in rows["prio"].to_pylist()]
    best = {}
    for i in range(24):
        g = rows["grp"][i]
        if g not in best or prios[i] > best[g]:
            best[g] = prios[i]
    expect_order = [g for g, _ in sorted(best.items(), key=lambda kv: -kv[1])]
    assert res.hits["grp"].to_pylist() == expect_order
    assert res.hits["prio"].to_pylist() == sorted(best.values(), reverse=True)
    # counts per group
    assert all(c == 24 // 5 or c == 24 // 5 + 1 for c in res.hits["duplicateCount"].to_pylist())


def test_dedup_with_nullable_field_sort(grouped_index):
    d, rows = grouped_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    # ascending sort on a nullable string: None fills "" → sorts first
    res = s.execute(
        TermQ("common"),
        stop=5,
        dedup_field="grp",
        sort=[("name", False, None)],
        stored_fields=("name",),
    )
    assert res.total == 5
    got = res.hits["name"].to_pylist()
    filled = ["" if v is None else v for v in got]
    assert filled == sorted(filled)


def test_drilldown_fieldnames(grouped_index):
    d, _ = grouped_index
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    top = s.drilldown_fieldnames("cat")
    assert top == ["top"]
    mids = set(s.drilldown_fieldnames("cat", ["top"]))
    assert mids == {"mid0", "mid1", "mid2"}
    leaves = set(s.drilldown_fieldnames("cat", ["top", "mid0"]))
    assert leaves <= {"leaf0", "leaf1", "leaf2", "leaf3"} and leaves
    assert s.drilldown_fieldnames("cat", ["nope"]) == []


def test_drilldown_fieldnames_taxonomy_order(ray_session, tmp_path):
    """order='taxonomy' mirrors the reference exactly (Lucene.java:692-713):
    TaxonomyReader children come back in INSERTION order — the order labels
    were first seen while indexing — not count order, not lexicographic.
    A Lucene taxonomy also never shrinks: deleting every doc carrying a
    label leaves the label in place."""
    import ray.data as rd

    from meresco_lucene_ray.index.build import delete_documents

    paths = [
        ["r", "zeta"],   # first label seen: zeta (lexicographically last)
        ["r", "alpha"],
        ["r", "alpha"],
        ["r", "mid"],
        ["r", "alpha"],  # alpha wins on count, zeta on insertion
    ]
    rows = {
        "__id__": [f"d{i}" for i in range(len(paths))],
        "text": ["w%d common" % i for i in range(len(paths))],
        "cat": pa.array(paths, type=pa.list_(pa.string())),
    }
    d = str(tmp_path / "taxidx")
    cfg = IndexConfig(text_col="text", id_col="__id__", stored_cols=("cat",), num_shards=2)
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)

    assert s.drilldown_fieldnames("cat", ["r"], order="taxonomy") == ["zeta", "alpha", "mid"]
    # taxonomy order IS the default (the reference's only behavior)
    assert s.drilldown_fieldnames("cat", ["r"]) == ["zeta", "alpha", "mid"]
    # count order differs (alpha has 3 occurrences) — opt-in
    assert s.drilldown_fieldnames("cat", ["r"], order="count")[0] == "alpha"
    assert s.drilldown_fieldnames("cat", order="taxonomy") == ["r"]
    # limit applies after ordering
    assert s.drilldown_fieldnames("cat", ["r"], limit=2, order="taxonomy") == ["zeta", "alpha"]

    # taxonomy never shrinks: delete the only 'zeta' doc — label stays, and
    # still first (its first-seen position is immutable)
    delete_documents(d, ["d0"])
    s.refresh()
    assert s.drilldown_fieldnames("cat", ["r"], order="taxonomy") == ["zeta", "alpha", "mid"]


def test_dedup_with_facets_fused_single_pass(grouped_index):
    """Dedup + facets compose in ONE fused fan-out (DeDupFilterSuperCollector
    + FacetSuperCollector under one IndexSearcher.search, Lucene.java:436-480):
    facet counts equal the plain faceted query's (same match set — facets
    count ALL matching docs, not one per group), and the grouped page equals
    the facet-less dedup query's — on the driver AND distributed merges."""
    d, rows = grouped_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    q = TermQ("common")
    plain = s.execute(q, stop=0, facets=[("cat", "hier")])
    for gate in (500000, 0):
        s.dedup_driver_max_rows = gate
        ref = s.execute(q, stop=5, dedup_field="grp", dedup_sort_field="prio")
        got = s.execute(
            q, stop=5, dedup_field="grp", dedup_sort_field="prio",
            facets=[("cat", "hier")],
        )
        assert s.last_dedup_path == ("driver" if gate else "distributed")
        assert got.drilldown_data["cat"] == plain.drilldown_data["cat"]
        assert got.total == ref.total == 5
        assert got.hits["grp"].to_pylist() == ref.hits["grp"].to_pylist()
        assert got.hits["duplicateCount"].to_pylist() == ref.hits["duplicateCount"].to_pylist()
