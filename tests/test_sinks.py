"""Resumable partitioned sink: atomic per-partition dirs, _SUCCESS markers,
resume pruning, crash-recovery of half-written partitions."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meresco_lucene_ray.sinks import completed_partitions, write_partitioned


def _ds(n=20):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": [f"doc {i}" for i in range(n)],
                "bucket": [i % 4 for i in range(n)],
            }
        )
    )


def test_write_and_readback(tmp_path, ray_session):
    out = str(tmp_path / "out")
    manifest = write_partitioned(_ds(), out, partition_col="bucket")
    assert sorted(manifest["partition"].to_pylist()) == ["0", "1", "2", "3"]
    assert manifest["rows"].to_pylist() == [5, 5, 5, 5]
    assert not any(manifest["skipped"].to_pylist())
    assert completed_partitions(out) == {"0", "1", "2", "3"}
    got = pq.read_table(os.path.join(out, "part=2", "data.parquet"))
    assert sorted(got["doc_id"].to_pylist()) == [2, 6, 10, 14, 18]


def test_resume_skips_complete(tmp_path, ray_session):
    out = str(tmp_path / "out")
    write_partitioned(_ds(), out, partition_col="bucket")
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet"))
        for p in "0123"
    }
    # simulate a crashed run: partition 1 lost its marker (half-written)
    os.remove(os.path.join(out, "part=1", "_SUCCESS"))
    manifest = write_partitioned(_ds(), out, partition_col="bucket")
    by_part = dict(zip(manifest["partition"].to_pylist(), manifest["skipped"].to_pylist()))
    assert by_part == {"0": True, "1": False, "2": True, "3": True}
    # only partition 1 was rewritten
    for p in "023":
        assert os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet")) == mtimes[p]
    assert os.path.getmtime(os.path.join(out, "part=1", "data.parquet")) != mtimes["1"]
    assert completed_partitions(out) == {"0", "1", "2", "3"}


def test_partition_fn(tmp_path, ray_session):
    out = str(tmp_path / "out")

    def by_mod3(t: pa.Table):
        return t["doc_id"].to_numpy(zero_copy_only=False) % 3

    manifest = write_partitioned(_ds(9), out, partition_fn=by_mod3)
    assert sorted(manifest["partition"].to_pylist()) == ["0", "1", "2"]
    # derived partition column is not persisted
    t = pq.read_table(os.path.join(out, "part=0", "data.parquet"))
    assert t.schema.names == ["doc_id", "text", "bucket"]


def test_arg_validation(tmp_path, ray_session):
    with pytest.raises(ValueError, match="exactly one"):
        write_partitioned(_ds(), str(tmp_path / "x"))
    with pytest.raises(ValueError, match="exactly one"):
        write_partitioned(
            _ds(), str(tmp_path / "y"), partition_col="bucket", partition_fn=lambda t: None
        )
