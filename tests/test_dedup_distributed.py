"""Distributed dedup-group merge (the Q11 scale path): past the partial-row
gate the per-segment partials are merged through Ray Data and the driver
only sees O(page × blocks) rows.  These tests pin path equivalence on a
HIGH-CARDINALITY key (every group visits both code paths) and that the
gate actually routes."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ


@pytest.fixture(scope="module")
def highcard_index(ray_session, tmp_path_factory):
    import ray.data as rd

    # 120 docs, 60 distinct keys × 2 docs, spread over 5 shards; scores vary
    # via extra term repetitions so group ranks are non-trivial
    n = 120
    rows = {
        "__id__": [f"d{i:03d}" for i in range(n)],
        "text": ["common " + ("hit " * (1 + (i * 13) % 7)) for i in range(n)],
        "grp": pa.array([f"k{i % 60:03d}" for i in range(n)]),
        "prio": pa.array([(i * 11) % 37 for i in range(n)], type=pa.int64()),
        "name": pa.array(
            [None if i % 6 == 0 else f"n{(i * 5) % 41:02d}" for i in range(n)],
            type=pa.string(),
        ),
    }
    d = str(tmp_path_factory.mktemp("dd_dist") / "idx")
    cfg = IndexConfig(
        text_col="text",
        id_col="__id__",
        stored_cols=("grp", "prio", "name"),
        num_shards=5,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return d


def _page(res):
    t = res.hits.to_pandas()
    return list(
        zip(
            t["grp"],
            t["docid"],
            [round(s, 6) for s in t["score"]],
            t["duplicateCount"],
        )
    )


@pytest.mark.parametrize("start,stop", [(0, 10), (5, 15), (0, 100)])
def test_distributed_matches_driver_path(highcard_index, start, stop):
    s = IndexSearcher(highcard_index, num_actors=3, num_cpus=0.25)
    q = TermQ("hit")
    ref = s.execute(q, start=start, stop=stop, dedup_field="grp", dedup_sort_field="prio")
    assert s.last_dedup_path == "driver"
    s.dedup_driver_max_rows = 0  # force the Ray Data merge
    got = s.execute(q, start=start, stop=stop, dedup_field="grp", dedup_sort_field="prio")
    assert s.last_dedup_path == "distributed"
    assert got.total == ref.total == 60
    assert got.total_with_duplicates == ref.total_with_duplicates == 120
    assert _page(got) == _page(ref)


def test_distributed_empty_page_past_total(highcard_index):
    s = IndexSearcher(highcard_index, num_actors=2, num_cpus=0.25)
    s.dedup_driver_max_rows = 0
    res = s.execute(MatchAllQ(), start=60, stop=70, dedup_field="grp")
    assert s.last_dedup_path == "distributed"
    assert res.total == 60 and len(res.hits) == 0


@pytest.mark.parametrize(
    "start,stop,desc", [(0, 10, True), (5, 15, True), (0, 10, False), (0, 100, True)]
)
def test_distributed_fieldsort_matches_driver_path(highcard_index, start, stop, desc):
    """Field-sorted grouping (groups ranked by the REPRESENTATIVES' sort
    fields) routes through the distributed merge past the gate and matches
    the driver path row-for-row — including representative selection (max
    dedup_sort_field) and the repr-docid tiebreak."""
    s = IndexSearcher(highcard_index, num_actors=3, num_cpus=0.25)
    q = TermQ("hit")
    kw = dict(
        start=start,
        stop=stop,
        dedup_field="grp",
        dedup_sort_field="prio",
        sort=[("prio", desc, None)],
        stored_fields=("prio",),
    )
    ref = s.execute(q, **kw)
    assert s.last_dedup_path == "driver"
    s.dedup_driver_max_rows = 0
    got = s.execute(q, **kw)
    assert s.last_dedup_path == "distributed"
    assert got.total == ref.total == 60
    assert got.total_with_duplicates == ref.total_with_duplicates == 120
    assert _page(got) == _page(ref)
    assert got.hits["prio"].to_pylist() == ref.hits["prio"].to_pylist()


def test_distributed_fieldsort_nullable_sort_col(highcard_index):
    """Nullable sort columns use the same missing-value fills off-driver as
    the driver merge ('' for ascending strings) — path equivalence holds
    when some representatives have null sort values."""
    s = IndexSearcher(highcard_index, num_actors=3, num_cpus=0.25)
    q = TermQ("common")
    kw = dict(
        stop=12,
        dedup_field="grp",
        sort=[("name", False, None)],
        stored_fields=("name",),
    )
    ref = s.execute(q, **kw)
    assert s.last_dedup_path == "driver"
    s.dedup_driver_max_rows = 0
    got = s.execute(q, **kw)
    assert s.last_dedup_path == "distributed"
    assert got.total == ref.total
    assert _page(got) == _page(ref)
    assert got.hits["name"].to_pylist() == ref.hits["name"].to_pylist()


def test_distributed_driver_payload_o_page(ray_session, tmp_path_factory):
    """The distributed merges pull O(page × blocks) rows to the driver, NOT
    O(groups) — the 100 TB property (a high-cardinality dedup key must not
    become a driver OOM).  1500 groups, page of 10: both distributed paths
    stay two orders of magnitude under the group count, while the dense
    driver path pulls every group's partials."""
    import ray.data as rd

    n = 3000
    rows = {
        "__id__": [f"d{i:05d}" for i in range(n)],
        "text": ["hit " * (1 + (i * 13) % 5) for i in range(n)],
        "grp": pa.array([f"k{i % 1500:04d}" for i in range(n)]),
        "prio": pa.array([(i * 11) % 97 for i in range(n)], type=pa.int64()),
    }
    d = str(tmp_path_factory.mktemp("dd_payload") / "idx")
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("grp", "prio"), num_shards=4
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    s = IndexSearcher(d, num_actors=3, num_cpus=0.25)
    s.dedup_driver_max_rows = 0

    res = s.execute(TermQ("hit"), stop=10, dedup_field="grp", dedup_sort_field="prio")
    assert s.last_dedup_path == "distributed"
    assert res.total == 1500
    assert s.last_dedup_driver_rows < 200, s.last_dedup_driver_rows

    res = s.execute(
        TermQ("hit"),
        stop=10,
        dedup_field="grp",
        dedup_sort_field="prio",
        sort=[("prio", True, None)],
        stored_fields=("prio",),
    )
    assert s.last_dedup_path == "distributed"
    assert res.total == 1500
    assert s.last_dedup_driver_rows < 200, s.last_dedup_driver_rows

    # dense driver path, by contrast, pulls every group's partial rows
    s.dedup_driver_max_rows = 500000
    s.execute(TermQ("hit"), stop=10, dedup_field="grp")
    assert s.last_dedup_path == "driver"
    assert s.last_dedup_driver_rows >= 1500


def test_zero_match_dedup_keeps_id_column(highcard_index):
    """A dedup query matching NOTHING still returns a hits table with the
    __id__ column — SearchResult.ids() must return [] (it indexes __id__),
    on the driver path and past the gate."""
    for gate in (500000, 0):
        s = IndexSearcher(highcard_index, num_actors=2, num_cpus=0.25)
        s.dedup_driver_max_rows = gate
        res = s.execute(TermQ("nosuchterm"), stop=5, dedup_field="grp")
        assert res.total == 0
        assert res.ids() == []
        assert "__id__" in res.hits.column_names
