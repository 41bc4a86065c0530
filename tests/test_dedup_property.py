"""Property test for the distributed dedup-group merges: for RANDOM paging
windows, sort specs and dedup-sort fields, the Ray Data merge (score-ranked
or field-sorted) returns row-for-row what the dense driver merge returns.
One index built per module; ~0.4 s per example."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, TermQ


@pytest.fixture(scope="module")
def prop_searcher(ray_session, tmp_path_factory):
    import ray.data as rd

    # 90 docs / 40 groups; scores vary; prio has cross-group ties; name has
    # nulls (exercises the off-driver missing-value fills)
    n = 90
    rows = {
        "__id__": [f"d{i:03d}" for i in range(n)],
        "text": ["common " + ("hit " * (1 + (i * 7) % 5)) for i in range(n)],
        "grp": pa.array([f"k{i % 40:02d}" for i in range(n)]),
        "prio": pa.array([(i * 3) % 11 for i in range(n)], type=pa.int64()),
        "name": pa.array(
            [None if i % 5 == 0 else f"n{(i * 13) % 23:02d}" for i in range(n)],
            type=pa.string(),
        ),
    }
    d = str(tmp_path_factory.mktemp("dd_prop") / "idx")
    cfg = IndexConfig(
        text_col="text",
        id_col="__id__",
        stored_cols=("grp", "prio", "name"),
        num_shards=4,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return IndexSearcher(d, num_actors=3, num_cpus=0.25)


SORTS = [
    None,
    [("prio", True, None)],
    [("prio", False, None)],
    [("name", False, None)],
    [("name", True, None)],
    [("prio", True, None), ("name", False, None)],
]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    start=st.integers(min_value=0, max_value=45),
    size=st.integers(min_value=1, max_value=50),
    sort_i=st.integers(min_value=0, max_value=len(SORTS) - 1),
    dedup_sort=st.sampled_from([None, "prio"]),
    term=st.sampled_from(["hit", "common"]),
)
def test_distributed_equals_driver_dedup(
    prop_searcher, start, size, sort_i, dedup_sort, term
):
    s = prop_searcher
    kw = dict(
        start=start,
        stop=start + size,
        dedup_field="grp",
        dedup_sort_field=dedup_sort,
        sort=SORTS[sort_i],
        stored_fields=("prio", "name"),
    )
    s.dedup_driver_max_rows = 500000
    ref = s.execute(TermQ(term), **kw)
    assert s.last_dedup_path == "driver"
    s.dedup_driver_max_rows = 0
    got = s.execute(TermQ(term), **kw)
    assert s.last_dedup_path == "distributed"
    assert got.total == ref.total
    assert got.total_with_duplicates == ref.total_with_duplicates
    assert sorted(got.hits.column_names) == sorted(ref.hits.column_names), kw
    for c in ref.hits.column_names:
        if c == "score":
            continue
        assert got.hits[c].to_pylist() == ref.hits[c].to_pylist(), (c, kw)
    gs = [round(x, 6) for x in got.hits["score"].to_pylist()]
    rs = [round(x, 6) for x in ref.hits["score"].to_pylist()]
    assert gs == rs
