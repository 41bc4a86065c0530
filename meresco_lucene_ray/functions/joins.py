"""Join-strategy helpers shared by the relational entry pipelines.

Two concerns the 100 TB design point needs made explicit:

- ``derive_num_partitions``: hash-join/shuffle partition counts must scale
  with the data, not be hard-coded (a fixed 4 is a straggler at 100 TB and
  pure overhead at sf0.001).  Derived from the INPUT parquet bytes — known
  without executing the pipeline — at ~256 MB of input per partition.
- ``gather_small`` + ``broadcast_attach`` / ``broadcast_semi``: the classic
  broadcast join.  A filtered dimension side that fits in one worker's heap
  is shipped ONCE via ``ray.put`` (zero-copy numpy from the object store in
  every map task) and probed with ``np.searchsorted`` — no all-to-all
  exchange at all.  Callers gate on ``count() <= max_rows`` and fall back
  to the hash join when the side is genuinely big.

The reference has no relational star join; this module backs the
TPC-H-shaped pipelines (``star_revenue``, ``join_sort``) that a curation
workload runs around the index.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def input_bytes(*paths: str) -> int:
    """Total on-disk bytes of the given parquet files/directories — a
    pre-execution size signal for partition-count derivation."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def derive_num_partitions(
    nbytes: int, *, bytes_per_partition: int = 256 << 20, lo: int = 2, hi: int = 512
) -> int:
    """Partition count for a hash join/shuffle over ``nbytes`` of input:
    one partition per ~256 MB, clamped to [lo, hi]."""
    return max(lo, min(hi, (nbytes + bytes_per_partition - 1) // bytes_per_partition))


def partitions_for(*datasets, rows_per_partition: int = 2_000_000, lo: int = 4, hi: int = 512) -> int:
    """Partition count for a hash join over already-materialized datasets,
    derived from the largest side's ROW COUNT — metadata on a materialized
    dataset.  (``size_bytes()`` is NOT metadata on a from_arrow_refs
    dataset — it re-executes to measure; block count is a bad proxy the
    other way — a groupby emits many near-empty blocks and a 64-partition
    join over a 10k-row side is pure task overhead.)  ~2M rows per
    partition, clamped — scales the shuffle with the data without ever
    collapsing a huge side into a handful of partitions."""
    rows = 0
    for d in datasets:
        try:
            rows = max(rows, int(d.count() or 0))
        except Exception:
            pass
    return max(lo, min(hi, (rows + rows_per_partition - 1) // rows_per_partition))


def _empty_payload(ds, columns: list[str]) -> dict[str, np.ndarray]:
    """Typed empty broadcast payload: column dtypes come from the dataset
    schema (hard-coding int64 would diverge from the hash-join fallback and
    the SQL mirror on e.g. timestamp columns when the small side is empty)."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    return {
        c: pa.array([], type=types.get(c, pa.int64())).to_numpy(zero_copy_only=False)
        for c in columns
    }


def _null_safe_order(keys: np.ndarray) -> np.ndarray:
    """Stable sort order with NULL keys last: np.argsort on an object array
    containing None raises ('<' not supported between str and NoneType)."""
    if keys.dtype == object:
        import pandas as pd

        return (
            pd.Series(keys)
            .sort_values(kind="stable", na_position="last")
            .index.to_numpy(dtype=np.int64)
        )
    return np.argsort(keys, kind="stable")


def gather_small(ds, columns: list[str]) -> dict[str, np.ndarray]:
    """Collect a SMALL (already filtered/projected) Dataset's columns into
    numpy arrays, sorted by the first column — the broadcast payload.
    Streams batch-wise (never a single driver-side pandas frame); the caller
    is responsible for gating on row count.  Zero-column batches (Ray 2.49
    materializes fully-emptied blocks with an EMPTY schema) are skipped."""
    parts: dict[str, list[np.ndarray]] = {c: [] for c in columns}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_columns == 0:
            continue
        for c in columns:
            parts[c].append(b[c].to_numpy(zero_copy_only=False))
    if not any(parts.values()):
        return _empty_payload(ds, columns)
    out = {c: np.concatenate(v) for c, v in parts.items()}
    order = _null_safe_order(out[columns[0]])
    return {c: v[order] for c, v in out.items()}


def _gather_tables(cols, types, *tables):
    tables = [tb for tb in tables if tb.num_columns]
    if not tables:  # every block was an empty-schema block: typed empty
        return {
            c: pa.array([], type=types.get(c, pa.int64())).to_numpy(
                zero_copy_only=False
            )
            for c in cols
        }
    t = pa.concat_tables([tb.select(cols) for tb in tables], promote_options="default")
    out = {c: t[c].to_numpy(zero_copy_only=False) for c in cols}
    order = _null_safe_order(out[cols[0]])
    return {c: v[order] for c, v in out.items()}


_GATHER_REMOTE = None  # decorated once per process, not re-exported per query


def gather_small_ref(ds, columns: list[str]):
    """Like :func:`gather_small`, but the gather + sort runs INSIDE a Ray
    task over the dataset's block refs and the result stays in the object
    store: returns an ObjectRef to the sorted-column dict, passable straight
    to :func:`broadcast_semi` / :func:`broadcast_anti` /
    :func:`broadcast_attach`.  The broadcast payload never streams through
    the driver heap — at the 20M-row broadcast gate that is hundreds of MB
    the driver would otherwise copy once per query.

    Contract: ``ds`` must already be materialized (every caller gates on
    ``ds.count()`` first, which executes the plan) — ``to_arrow_refs`` on a
    still-lazy Dataset would re-run its upstream pipeline."""
    import ray

    refs = ds.to_arrow_refs()
    if not refs:
        return ray.put(_empty_payload(ds, columns))

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    global _GATHER_REMOTE
    if _GATHER_REMOTE is None:
        _GATHER_REMOTE = ray.remote(num_cpus=1)(_gather_tables)
    return _GATHER_REMOTE.remote(list(columns), types, *refs)


def _broadcast_keys(obj, key_col: str) -> np.ndarray:
    """The broadcast side of semi/anti joins: either a bare sorted key array
    (legacy ``ray.put(gather_small(...)[key])``) or the sorted-column dict
    from :func:`gather_small_ref`."""
    return obj[key_col] if isinstance(obj, dict) else obj


def _nullable(arr: np.ndarray) -> bool:
    return arr.dtype == object or arr.dtype.kind == "f"


def _member_mask(keys: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    """Membership of ``keys`` in the sorted payload, with SQL join semantics
    for NULLs: a NULL key (None / NaN) matches nothing on either side.
    np.searchsorted raises on object arrays containing None (and None==None
    is elementwise True), so payload NAs are stripped (``_null_safe_order``
    sorts them last) and probe NAs are sentinel-replaced then masked out."""
    import pandas as pd

    if len(sorted_keys) and _nullable(sorted_keys) and pd.isna(sorted_keys[-1]):
        # NAs sort last (_null_safe_order / NaN), so the O(1) last-element
        # check gates the O(payload) strip to the rare NA-bearing payload
        sorted_keys = sorted_keys[~pd.isna(sorted_keys)]
    if not len(sorted_keys):
        return np.zeros(len(keys), bool)
    na = None
    if _nullable(keys):
        na = pd.isna(keys)
        if na.any():
            keys = keys.copy()
            keys[na] = sorted_keys[0]
        else:
            na = None
    pos = np.searchsorted(sorted_keys, keys)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    mask = sorted_keys[pos_c] == keys
    if na is not None:
        mask &= ~na
    return mask


def broadcast_semi(ds, key_col: str, keys_ref):
    """Semi-join filter: keep rows whose ``key_col`` is in the broadcast
    sorted key array (``ray.put`` of ``gather_small(...)[key]``)."""
    import ray

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # incl. Ray's zero-column empty-schema blocks
            return t
        sorted_keys = _broadcast_keys(ray.get(keys_ref), key_col)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.flatnonzero(_member_mask(keys, sorted_keys))))

    return ds.map_batches(stage, batch_format="pyarrow")


def broadcast_anti(ds, key_col: str, keys_ref):
    """Anti-join filter: DROP rows whose ``key_col`` is in the broadcast
    sorted key array — the keep-canonical dedup filter shape."""
    import ray

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # incl. Ray's zero-column empty-schema blocks
            return t
        sorted_keys = _broadcast_keys(ray.get(keys_ref), key_col)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.flatnonzero(~_member_mask(keys, sorted_keys))))

    return ds.map_batches(stage, batch_format="pyarrow")


class _FloatKeyFilter:
    """Drop rows whose float key is null or NaN — applied to the small side
    of :func:`attach_small`'s join fallback so it matches the broadcast
    path's float-key contract (numpy gather collapses null and NaN, so the
    broadcast side cannot distinguish them; neither key ever matches)."""

    def __init__(self, key_col: str):
        self.key_col = key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_columns == 0 or len(t) == 0:
            return t
        col = t[self.key_col]
        keep = pc.and_kleene(pc.is_valid(col), pc.invert(pc.is_nan(col)))
        return t.filter(keep)


class _AttachStage:
    """Broadcast-attach worker state, built ONCE per worker process (via
    ``cached_stage``): the payload's key column and value columns converted
    to Arrow arrays so every batch probes with ``pc.index_in`` — a C++ hash
    lookup that is equally fast for int64 and string keys (the former
    per-batch ``np.searchsorted`` fell back to Python object comparisons on
    string keys)."""

    # keyed on a per-query ObjectRef (never reused across queries) and
    # holding a full ≤5M-row payload copy per entry; bound tighter than the
    # 32-slot FIFO so dead payloads don't pin worker memory
    CACHE_SLOTS = 4

    def __init__(self, small_ref, key_col: str, value_cols: tuple):
        import pyarrow.compute as pc
        import ray

        small = ray.get(small_ref)
        skeys = pa.array(small[key_col])
        values = [pa.array(small[c]) for c in value_cols]
        # SQL inner-join semantics: NULL keys match nothing.  pc.index_in
        # matches a null probe to a null in the value_set, so a null (or, on
        # a nulls->float payload, NaN) key row in the small side would KEEP
        # rows the hash-join fallback and the SQL oracle drop — filter them
        # out of the payload once per worker.
        if len(skeys) and not pa.types.is_null(skeys.type):
            keep = pc.is_valid(skeys)
            if pa.types.is_floating(skeys.type):
                # and_kleene: False AND null -> False (is_nan is null on a
                # null element; plain and_ would propagate the null into the
                # mask and flatnonzero would see it as truthy NaN)
                keep = pc.and_kleene(keep, pc.invert(pc.is_nan(skeys)))
            if not pc.all(keep).as_py():
                idx = pa.array(np.flatnonzero(keep.to_numpy(zero_copy_only=False)))
                skeys = skeys.take(idx)
                values = [v.take(idx) for v in values]
        self.skeys = skeys
        self.values = values

    def __call__(self, t: pa.Table, probe_col: str, out_cols: tuple) -> pa.Table:
        # probe_col/out_cols are CALL-time arguments, not cache-key state:
        # one payload probed under two roles (PMI's w1/w2) shares one entry
        import pyarrow.compute as pc

        if len(t) == 0:
            # typed empty (a zero-column empty-schema block has no probe
            # column to index): keep whatever input columns exist, append
            # typed empty value columns so downstream schemas unify
            for out, vals in zip(out_cols, self.values):
                t = t.append_column(out, pa.array([], type=vals.type))
            return t
        keys = t[probe_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(self.skeys) == 0 or pa.types.is_null(self.skeys.type):
            pos = pa.nulls(len(keys), type=pa.int32())
        else:
            if keys.type != self.skeys.type and not pa.types.is_null(keys.type):
                keys = keys.cast(self.skeys.type)
            pos = pc.index_in(keys, value_set=self.skeys)
        valid = pc.is_valid(pos)
        t = t.filter(valid)
        posv = pos.filter(valid)
        for out, vals in zip(out_cols, self.values):
            t = t.append_column(out, vals.take(posv))
        return t


def broadcast_attach(
    ds, key_col: str, small_ref, value_cols: list[str], *, probe_col=None, out_cols=None
):
    """Inner join against a broadcast small side: drop non-matching rows and
    append the small side's ``value_cols`` via a hash probe (``pc.index_in``)
    against the broadcast payload (the dict from :func:`gather_small` /
    :func:`gather_small_ref`).  Precondition: the small side's keys are
    UNIQUE (dimension-table semantics); duplicate keys would silently
    resolve to one arbitrary row.

    ``probe_col`` (default ``key_col``) names the column of ``ds`` to probe
    with and ``out_cols`` (default ``value_cols``) the attached columns'
    output names — so ONE broadcast payload can be probed twice under
    different roles (e.g. a unigram table against both ``w1`` and ``w2``)."""
    from .hashing import cached_stage

    probe = probe_col or key_col
    vc = tuple(value_cols)
    oc = tuple(out_cols) if out_cols is not None else vc

    def stage(t: pa.Table) -> pa.Table:
        return cached_stage(_AttachStage, small_ref, key_col, vc)(t, probe, oc)

    return ds.map_batches(stage, batch_format="pyarrow")


def attach_small(rows, small, key_col: str, value_cols: list[str]):
    """Size-gated inner attach of a small aggregate side onto a big rows
    side: broadcast (one off-driver gather + per-batch hash probe, zero
    shuffle) when the small side fits the gate, hash join past it.  The
    default gate (5M rows ≈ 40-80 MB payload) holds one copy per node.
    ``small`` must be materialized (``count()`` is then metadata and
    ``gather_small_ref``'s to_arrow_refs contract holds); ``rows`` should
    be too when the small side can exceed the gate — the join fallback's
    ``partitions_for`` counts BOTH sides, and counting a lazy big side
    would execute its upstream pipeline once just for the partition
    count.  (Every textstats caller passes ``_snap_nonempty`` outputs,
    which are materialized.)"""
    gate = int(os.environ.get("MLR_ATTACH_BCAST_MAX", 5_000_000))
    if small.count() <= gate:
        ref = gather_small_ref(small, [key_col, *value_cols])
        return broadcast_attach(rows, key_col, ref, value_cols)
    if rows.count() == 0:
        # Ray's hash join raises inside acero on the zero-column blocks an
        # empty side materializes ("No match or multiple matches for key
        # field reference"); an inner join with an empty rows side is a
        # typed empty table
        import ray.data as rd

        rsch, ssch = rows.schema(), small.schema()
        stypes = dict(zip(ssch.names, ssch.types))
        # schema() is None when every block was emptied; type what we can
        # from the small side (key + value columns)
        rcols = [] if rsch is None else list(zip(rsch.names, rsch.types))
        cols = {n: pa.array([], type=t) for n, t in rcols}
        if key_col not in cols:
            cols[key_col] = pa.array([], type=stypes.get(key_col, pa.int64()))
        for c in value_cols:
            cols[c] = pa.array([], type=stypes.get(c, pa.int64()))
        return rd.from_arrow(pa.table(cols))
    key_t = dict(zip(small.schema().names, small.schema().types)).get(key_col)
    if key_t is not None and pa.types.is_floating(key_t):
        # The broadcast path gathers keys through numpy, where null and NaN
        # collapse — its contract is "float NaN/null keys match nothing".
        # Ray's hash join matches NaN=NaN (as SQL does), so filter them from
        # the small side to keep the two gate paths equivalent.
        small = small.map_batches(
            _FloatKeyFilter(key_col), batch_format="pyarrow"
        ).materialize()
    return rows.join(
        small,
        join_type="inner",
        num_partitions=partitions_for(rows, small),
        on=(key_col,),
    )
