"""Regression tests for the round-1 ADVICE findings:

1. key_value_array must be independent of actor count (global docid order,
   not actor-concatenation order, decides "last write per key wins").
2. _merge_hits must apply the same missing-value fill as the per-segment
   sort cut (nullable sort columns).
3. merge resume fingerprint must cover tombstone state (no stale-segment
   reuse after delete_documents).
4. ComposedQuery with unresolvable key columns raises clear errors instead
   of crashing inside SegmentSearcher.
5. add_documents tolerates leftover seg=NNNNN.tmp dirs from interrupted
   builds.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import add_documents, delete_documents
from meresco_lucene_ray.index.merge import merge_index
from meresco_lucene_ray.join import ComposedQuery, MultiSearcher
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ


def _build(tmp_path, name, tbl, stored, num_shards=4):
    import ray.data as rd

    d = str(tmp_path / name)
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=stored, num_shards=num_shards
    )
    build_index(rd.from_arrow(tbl), d, cfg)
    return d, cfg


def test_key_value_array_actor_count_invariant(ray_session, tmp_path):
    # 12 docs, keys repeat across shards; value = docid-ordered marker
    n = 12
    tbl = pa.table(
        {
            "__id__": [f"d{i}" for i in range(n)],
            "text": [f"word{i} common" for i in range(n)],
            "key": pa.array([i % 4 for i in range(n)], type=pa.int64()),
            "val": pa.array([i * 10 for i in range(n)], type=pa.int64()),
        }
    )
    d, _ = _build(tmp_path, "kv_idx", tbl, ("key", "val"), num_shards=6)
    ref = IndexSearcher(d, num_actors=1, num_cpus=0.25).key_value_array("key", "val", 8)
    for n_act in (2, 3, 5):
        got = IndexSearcher(d, num_actors=n_act, num_cpus=0.25).key_value_array("key", "val", 8)
        np.testing.assert_array_equal(got, ref)
    # and the reference itself is last-by-docid: recompute from the raw index
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    full = s.execute(MatchAllQ(), stop=n, stored_fields=("key", "val"))
    hits = full.hits.to_pandas().sort_values("docid")
    expect = np.full(8, np.iinfo(np.int64).max, dtype=np.int64)
    for _, r in hits.iterrows():
        expect[int(r["key"])] = int(r["val"])
    np.testing.assert_array_equal(ref, expect)


def test_merge_hits_nullable_sort_column(ray_session, tmp_path):
    # missing sort values must sort the same per-segment and globally:
    # strings fill with "" (sort FIRST ascending)
    n = 10
    tbl = pa.table(
        {
            "__id__": [f"d{i}" for i in range(n)],
            "text": ["common"] * n,
            "name": pa.array(
                [None if i % 3 == 0 else f"n{i:02d}" for i in range(n)], type=pa.string()
            ),
        }
    )
    d, _ = _build(tmp_path, "null_idx", tbl, ("name",), num_shards=4)
    for n_act in (1, 2, 3):
        s = IndexSearcher(d, num_actors=n_act, num_cpus=0.25)
        res = s.execute(MatchAllQ(), stop=5, sort=[("name", False, None)])
        got = res.hits["name"].to_pylist()
        # page of 5: the None docs (fill "") come first, then smallest names
        assert got[:4] == [None, None, None, None], got
        assert got[4] == "n01"


def test_merge_refuses_stale_segment_after_delete(ray_session, tmp_path):
    import ray.data as rd

    tbl = pa.table(
        {
            "__id__": [f"d{i}" for i in range(8)],
            "text": [f"alpha w{i}" for i in range(8)],
        }
    )
    d = str(tmp_path / "src")
    out = str(tmp_path / "merged")
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=4)
    build_index(rd.from_arrow(tbl), d, cfg)
    merge_index(d, out, max_merge_at_once=4, num_actors=1)
    assert IndexSearcher(out, num_actors=1).count(TermQ("alpha")) == 8
    # delete two docs, re-merge into the SAME out dir: segments must rebuild
    delete_documents(d, ["d0", "d5"])
    merge_index(d, out, max_merge_at_once=4, num_actors=1)
    assert IndexSearcher(out, num_actors=1).count(TermQ("alpha")) == 6


def test_composed_clear_errors(ray_session, tmp_path):
    tbl = pa.table(
        {
            "__id__": ["x1", "x2"],
            "text": ["alpha", "beta"],
            "key": pa.array([1, 2], type=pa.int64()),
        }
    )
    da, _ = _build(tmp_path, "ca", tbl, ("key",), num_shards=1)
    db, _ = _build(tmp_path, "cb", tbl, ("key",), num_shards=1)
    ms = MultiSearcher(
        {"A": IndexSearcher(da, num_actors=1, num_cpus=0.25), "B": IndexSearcher(db, num_actors=1, num_cpus=0.25)}, 8
    )
    # filter against a core with no registered match → KeyError naming cores
    cq = ComposedQuery(result_core="A", queries={"A": TermQ("alpha")})
    cq.filter_queries["B"] = [TermQ("beta")]
    with pytest.raises(KeyError, match="no match registered"):
        ms.execute(cq)
    # relational filter with no resolvable result key col → clear ValueError
    from meresco_lucene_ray.join.relational import RelLeaf

    cq2 = ComposedQuery(
        result_core="A",
        queries={"A": TermQ("alpha")},
        relational_filter=RelLeaf("B", "key", "key", TermQ("beta")),
    )
    with pytest.raises(ValueError, match="register a match"):
        ms.execute(cq2)


def test_add_documents_skips_tmp_segment_dirs(ray_session, tmp_path):
    import ray.data as rd

    tbl = pa.table({"__id__": ["a1"], "text": ["alpha"]})
    d = str(tmp_path / "tmp_idx")
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=1)
    build_index(rd.from_arrow(tbl), d, cfg)
    os.makedirs(os.path.join(d, "segments", "seg=00099.tmp"))
    add_documents(rd.from_arrow(pa.table({"__id__": ["a2"], "text": ["beta"]})), d, cfg)
    s = IndexSearcher(d, num_actors=1)
    assert s.count(MatchAllQ()) == 2


def test_termstats_reader_rowgroup_bisect(tmp_path):
    """The 10^12-vocabulary stats path: row-group bisect via parquet column
    statistics must agree with the full-load path for present and absent
    terms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from meresco_lucene_ray.query.engine import TermStatsReader

    terms = sorted(f"t{i:04d}" for i in range(0, 1000, 3))
    dfs = [i + 1 for i in range(len(terms))]
    path = str(tmp_path / "termstats.parquet")
    pq.write_table(
        pa.table({"term": terms, "df": pa.array(dfs, type=pa.int64()), "cf": dfs}),
        path,
        row_group_size=37,
    )
    full = TermStatsReader(path)
    assert full.full is not None
    lazy = TermStatsReader(path, max_full_load_rows=10)
    assert lazy.full is None and len(lazy._rg_max) > 5
    probe = [terms[0], terms[7], terms[-1], "t0001", "zzz", "aaa", terms[123]]
    assert lazy.df_of(probe) == full.df_of(probe)
    assert lazy.all_stats() == full.all_stats()
    # cache bounded
    lazy2 = TermStatsReader(path, max_full_load_rows=10, cache_groups=2)
    lazy2.df_of(probe)
    assert len(lazy2._rg_cache) <= 2
