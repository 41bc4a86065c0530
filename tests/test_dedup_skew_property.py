"""Adversarial-skew property test for the distributed dedup merge (Q11 scale
path): ONE dedup key holds 50% of all docs across every segment — the
worst-case hot group a 100 TB corpus produces.  Hypothesis sweeps paging and
ranking modes asserting

1. the candidate-cover invariant: the distributed merge returns EXACTLY the
   driver merge's page (totals, group order, representatives, counts), and
2. the O(page x blocks) driver pin still holds under the skew (per-segment
   partials are per-KEY aggregates, so a hot key contributes one row per
   segment, never one per doc).
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, TermQ

N_DOCS = 2000
N_COLD_KEYS = 100  # plus the one hot key = 101 groups
HOT_KEY = "khot"


@pytest.fixture(scope="module")
def skewed_index(ray_session, tmp_path_factory):
    import ray.data as rd

    # every EVEN doc carries the hot key (50% of the corpus, present in all
    # shards); odd docs spread over 100 cold keys (10 docs each)
    grp = [HOT_KEY if i % 2 == 0 else f"k{(i // 2) % N_COLD_KEYS:03d}" for i in range(N_DOCS)]
    rows = {
        "__id__": [f"d{i:05d}" for i in range(N_DOCS)],
        "text": ["hit " * (1 + (i * 13) % 5) for i in range(N_DOCS)],
        "grp": pa.array(grp),
        "prio": pa.array([(i * 17) % 251 for i in range(N_DOCS)], type=pa.int64()),
    }
    d = str(tmp_path_factory.mktemp("dd_skew") / "idx")
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("grp", "prio"), num_shards=6
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


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    start=st.integers(min_value=0, max_value=105),
    length=st.integers(min_value=1, max_value=30),
    mode=st.sampled_from(["score", "field_asc", "field_desc"]),
)
def test_skewed_hot_key_distributed_equals_driver(skewed_index, start, length, mode):
    s = IndexSearcher(skewed_index, num_actors=3, num_cpus=0.25)
    kw = dict(
        start=start,
        stop=start + length,
        dedup_field="grp",
        dedup_sort_field="prio",
    )
    if mode != "score":
        kw["sort"] = [("prio", mode == "field_desc", None)]
        kw["stored_fields"] = ("prio",)

    ref = s.execute(TermQ("hit"), **kw)
    assert s.last_dedup_path == "driver"
    s.dedup_driver_max_rows = 0
    got = s.execute(TermQ("hit"), **kw)
    assert s.last_dedup_path == "distributed"

    # candidate-cover invariant: identical page under the 50% hot key
    assert got.total == ref.total == N_COLD_KEYS + 1
    assert got.total_with_duplicates == ref.total_with_duplicates == N_DOCS
    assert _page(got) == _page(ref)
    if "stored_fields" in kw:
        assert got.hits["prio"].to_pylist() == ref.hits["prio"].to_pylist()

    # O(page x blocks) pin: a hot key is ONE partial row per segment, so the
    # driver payload stays far under the group count even at 50% skew
    assert s.last_dedup_driver_rows <= 40 * max(10, length), s.last_dedup_driver_rows


def test_hot_key_representative_and_count(skewed_index):
    """The hot group's duplicateCount is exactly half the corpus and its
    representative carries the global max prio — identical on both paths
    (the docid tie-break among equal-prio members is pinned by cross-path
    equality; docid bases are per-segment, not input-ordinal)."""
    reps = []
    for gate in (500_000, 0):
        s = IndexSearcher(skewed_index, num_actors=3, num_cpus=0.25)
        s.dedup_driver_max_rows = gate
        res = s.execute(
            TermQ("hit"),
            stop=N_COLD_KEYS + 1,
            dedup_field="grp",
            dedup_sort_field="prio",
            stored_fields=("prio",),
        )
        t = res.hits.to_pandas()
        hot = t[t["grp"] == HOT_KEY]
        assert len(hot) == 1 and int(hot["duplicateCount"].iloc[0]) == N_DOCS // 2
        best_prio = max((i * 17) % 251 for i in range(0, N_DOCS, 2))
        assert int(hot["prio"].iloc[0]) == best_prio
        reps.append((hot["__id__"].iloc[0], int(hot["docid"].iloc[0])))
    assert reps[0] == reps[1]  # driver and distributed agree on the tie
