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
    }
    d = str(tmp_path_factory.mktemp("dd_dist") / "idx")
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("grp", "prio"), num_shards=5
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


def test_field_sorted_dedup_stays_on_driver_path(highcard_index):
    # ranking groups by representative sort fields needs O(groups) fetched
    # values — documented to stay on the dense path regardless of the gate
    s = IndexSearcher(highcard_index, num_actors=2, num_cpus=0.25)
    s.dedup_driver_max_rows = 0
    res = s.execute(
        TermQ("common"), stop=5, dedup_field="grp", sort=[("prio", True, None)]
    )
    assert s.last_dedup_path == "driver"
    assert res.total == 60
