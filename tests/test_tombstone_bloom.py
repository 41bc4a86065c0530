"""Tombstones at scale: the driver never materializes the tombstone set —
query actors load ``tombstones.parquet`` themselves and apply it per segment
through a bloom-pre-filtered vectorized probe (index/tombstones.py).

Mirrors the reference's liveDocs semantics (deleteDocument/updateDocument,
Lucene.java:166-181): dead docs stop matching immediately, df/avgdl stay
until merge."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import append_tombstones
from meresco_lucene_ray.index.tombstones import TombstoneSet, tombstone_path
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ


def test_tombstone_set_exact_semantics(tmp_path):
    p = str(tmp_path / "tombstones.parquet")
    ids = [f"id{i}" for i in range(1000)]
    pq.write_table(
        pa.table(
            {
                # append-only log: id5 appears twice, max(before_shard) wins
                "__id__": pa.array(ids + ["id5"]),
                "before_shard": pa.array(
                    np.concatenate([np.full(1000, 3, dtype=np.int32), [9]]).astype("int32")
                ),
            }
        ),
        p,
    )
    ts = TombstoneSet(p)
    assert len(ts) == 1000  # log collapsed per id
    probe = pa.array(["id5", "id7", "absent", "id999"])
    assert ts.deleted_mask(probe, 2).tolist() == [True, True, False, True]
    assert ts.deleted_mask(probe, 8).tolist() == [True, False, False, False]
    assert ts.deleted_mask(probe, 9) is None  # max_before gate
    assert ts.before_shard_of(probe).tolist() == [9, 3, -1, 3]
    # bloom false positives never surface: the exact probe filters them
    miss = ts.deleted_mask(pa.array([f"zz{i}" for i in range(50000)]), 0)
    assert miss is None or not miss.any()


def test_hundred_k_tombstones_off_driver(ray_session, tmp_path, monkeypatch):
    import ray.data as rd

    d = str(tmp_path / "idx")
    n = 400
    tbl = pa.table(
        {
            "__id__": [f"doc{i}" for i in range(n)],
            "text": ["alpha beta" if i % 2 else "gamma delta" for i in range(n)],
        }
    )
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=4)
    build_index(rd.from_arrow(tbl), d, cfg)

    # 10^5 tombstones: every odd doc + a large mass of foreign ids (the
    # realistic case — a shared tombstone log covering many other shards)
    dead_ids = [f"doc{i}" for i in range(1, n, 2)]
    foreign = [f"other{i}" for i in range(100000 - len(dead_ids))]
    append_tombstones(d, dead_ids + foreign, before_shard=10_000)

    # constant driver footprint: the legacy driver-side loader must NOT run
    import meresco_lucene_ray.index.build as build_mod

    def _forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver materialized the tombstone set")

    monkeypatch.setattr(build_mod, "load_tombstones", _forbidden)

    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    assert s.count(MatchAllQ()) == n // 2
    assert s.count(TermQ("alpha")) == 0  # all odd docs dead
    assert s.count(TermQ("gamma")) == n // 2
    ids = s.execute(MatchAllQ(), stop=n).hits["__id__"].to_pylist()
    assert all(int(i[3:]) % 2 == 0 for i in ids)


def test_tombstone_path_helper(tmp_path):
    assert tombstone_path(str(tmp_path)) is None
    p = str(tmp_path / "tombstones.parquet")
    pq.write_table(pa.table({"__id__": ["x"], "before_shard": pa.array([1], "int32")}), p)
    assert tombstone_path(str(tmp_path)) == p
