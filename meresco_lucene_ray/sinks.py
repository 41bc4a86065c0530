"""Resumable partitioned parquet sink.

At 100 TB a pipeline run WILL lose workers or be restarted; output must be
organized so a re-run skips everything already durable instead of starting
over.  ``write_partitioned`` generalizes the index build's atomic-segment
contract (``index/build.py`` ``_atomic_write_segment``: tmp dir → fsync'd
files → ``os.replace`` → ``_SUCCESS`` marker) to any Dataset:

- output is one directory per partition key value (never one giant file);
- a partition directory is visible only after its ``_SUCCESS`` marker —
  half-written partitions from a crashed run are ignored and rewritten;
- on resume, complete partitions are detected DRIVER-side from the marker
  files and their rows are pruned BEFORE the shuffle, so a 99 %-done re-run
  only moves the missing 1 % of data;
- writes happen inside ``groupby(part).map_groups`` tasks — each partition
  is written by exactly one task, so the marker is a correct completion
  witness (no cross-task append races).

The returned table is the per-partition manifest (partition, rows, bytes,
skipped) — O(#partitions), never O(rows).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SUCCESS = "_SUCCESS"


def _part_dir(out_dir: str, value) -> str:
    return os.path.join(out_dir, f"part={value}")


def completed_partitions(out_dir: str) -> set[str]:
    """Partition key values (as strings) with a ``_SUCCESS`` marker."""
    done = set()
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("part=") and os.path.exists(
                os.path.join(out_dir, name, SUCCESS)
            ):
                done.add(name[len("part=") :])
    return done


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str | None = None,
    partition_fn: Callable[[pa.Table], "np.ndarray"] | None = None,
    resume: bool = True,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/part=<value>/data.parquet`` directories,
    atomically per partition, skipping partitions already marked complete.

    Exactly one of ``partition_col`` (an existing column) or
    ``partition_fn`` (batch → per-row partition values, e.g. a hash of the
    id column) must be given.  Returns the per-partition manifest table."""
    if (partition_col is None) == (partition_fn is None):
        raise ValueError("need exactly one of partition_col / partition_fn")
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()

    col = partition_col or "__part__"

    def assign(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        if partition_fn is not None:
            t = t.append_column(col, pa.array(partition_fn(t)))
        if done:  # prune complete partitions BEFORE the shuffle
            vals = t[col].cast(pa.string()).to_numpy(zero_copy_only=False)
            keep = ~np.isin(vals, list(done))
            t = t.take(pa.array(np.flatnonzero(keep)))
        return t

    pruned = ds.map_batches(assign, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        value = group[col][0].as_py()
        target = _part_dir(out_dir, value)
        tmp = target + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        body = group.drop_columns([col]) if partition_col is None else group
        pq.write_table(body, os.path.join(tmp, "data.parquet"))
        shutil.rmtree(target, ignore_errors=True)  # half-written prior run
        os.replace(tmp, target)
        with open(os.path.join(target, SUCCESS), "w") as f:
            f.write(str(len(group)))
        return pa.table(
            {
                "partition": pa.array([str(value)]),
                "rows": pa.array([len(group)], type=pa.int64()),
                "bytes": pa.array(
                    [os.path.getsize(os.path.join(target, "data.parquet"))],
                    type=pa.int64(),
                ),
                "skipped": pa.array([False]),
            }
        )

    written = pruned.groupby(col).map_groups(write_group, batch_format="pyarrow")
    rows = written.take_all()
    manifest = {
        "partition": [r["partition"] for r in rows],
        "rows": [r["rows"] for r in rows],
        "bytes": [r["bytes"] for r in rows],
        "skipped": [r["skipped"] for r in rows],
    }
    for p in sorted(done):
        marker = os.path.join(_part_dir(out_dir, p), SUCCESS)
        with open(marker) as f:
            n = int(f.read() or 0)
        manifest["partition"].append(p)
        manifest["rows"].append(n)
        manifest["bytes"].append(
            os.path.getsize(os.path.join(_part_dir(out_dir, p), "data.parquet"))
        )
        manifest["skipped"].append(True)
    order = np.argsort(np.asarray(manifest["partition"], dtype=object)).tolist()
    types = {
        "partition": pa.string(),
        "rows": pa.int64(),
        "bytes": pa.int64(),
        "skipped": pa.bool_(),
    }
    return pa.table(
        {k: pa.array([v[i] for i in order], type=types[k]) for k, v in manifest.items()}
    )
