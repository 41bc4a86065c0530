"""Grouped relational operators for training-data pipelines.

``topk_per_group`` is the workhorse: "best k docs per repo / per language /
per dedup cluster" — the selection step between scoring and packing in a
curation pipeline.

Scale shape: a map-side PARTIAL top-k inside every batch first (vectorized
lexsort + run-length heads, no Python over rows), so at most k rows per
(group, block) ever reach the shuffle; the final per-group reduction then
runs over ≤ k·num_blocks candidate rows per group.  The wide step is Ray's
groupby — hash-keyed on the group column, the one partitioning key the
pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import strip_meta


def _partial_topk_table(
    t: pa.Table, group_col: str, order_col: str, k: int, descending: bool, tie_col: str | None
) -> pa.Table:
    """Vectorized per-group head-k of one batch: lexsort by (group, order,
    tie), rank rows within their group run, keep rank < k."""
    t = strip_meta(t)
    if len(t) == 0:
        return t
    g = t[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    # dictionary-encode group values so the sort key is an int array
    codes = g.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    v = t[order_col].to_numpy(zero_copy_only=False)
    key = -v if descending else v
    keys = (key, codes) if tie_col is None else (
        t[tie_col].to_numpy(zero_copy_only=False), key, codes)
    order = np.lexsort(keys)
    sc = codes[order]
    starts = np.zeros(sc.size, dtype=bool)
    starts[0] = True
    starts[1:] = sc[1:] != sc[:-1]
    run_id = np.cumsum(starts) - 1
    run_start = np.flatnonzero(starts)
    rank = np.arange(sc.size) - run_start[run_id]
    keep = order[rank < k]
    keep.sort()  # preserve input order for deterministic ties downstream
    return t.take(pa.array(keep))


def topk_per_group(
    ds, group_col: str, order_col: str, k: int, descending: bool = True, tie_col: str | None = None
):
    """Top-k rows per group over a Dataset.

    Two stages: (1) map-side partial top-k per batch — only k candidates per
    (group, batch) cross the wire; (2) groupby(group) final top-k.  The final
    per-group function is numpy over an already k·blocks-bounded candidate
    set, not over the data.  Pass a unique ascending ``tie_col`` for fully
    deterministic results (without it, ties resolve by input order within a
    batch but arbitrarily across batches).
    """

    def partial(t: pa.Table) -> pa.Table:
        return _partial_topk_table(t, group_col, order_col, k, descending, tie_col)

    def final(t: pa.Table) -> pa.Table:
        return _partial_topk_table(t, group_col, order_col, k, descending, tie_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def exact_quantiles(ds, col: str, qs) -> list[tuple[float, int]]:
    """EXACT order statistics without a global sort: map-side per-batch value
    counts → one groupby(value) sum — the driver then sees only the (distinct
    value, count) HISTOGRAM, never the data.  Exact whenever the column's
    distinct-value count is bounded (lengths, token counts, fixed-precision
    quantized scores) — the standard 100 TB percentile shape; for unbounded
    float columns quantize first.

    Semantics match DuckDB's ``quantile_disc``: the value at rank
    ``ceil(q·n) - 1`` of the sorted multiset.  Returns [(q, value), ...].
    """
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        t = strip_meta(t)
        g = pa.TableGroupBy(t.select([col]), col).aggregate([([], "count_all")])
        return pa.table({col: g[col], "cnt": g["count_all"]})

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    values = hist[col].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append((float(q), None))
            continue
        rank = max(int(np.ceil(q * n)) - 1, 0)
        idx = int(np.searchsorted(cum, rank + 1, side="left"))
        out.append((float(q), values[min(idx, len(values) - 1)]))
    return out


def grouped_quantiles(ds, group_col: str, col: str, qs):
    """EXACT per-group order statistics: the histogram trick of
    :func:`exact_quantiles` with the group key carried through — map-side
    per-batch (group, value) counts → one groupby((group, value)) sum → a
    per-group fold over each group's own tiny histogram.  No global sort,
    no per-group row materialization; the fold sees (distinct values ×
    groups) rows only.  Semantics match DuckDB ``quantile_disc`` per group:
    value at rank ``ceil(q·n) − 1`` of the group's sorted multiset.

    Returns a Dataset of (group, q, value) rows, len(qs) per group.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    qs = tuple(float(q) for q in qs)

    def counts(t: pa.Table) -> pa.Table:
        t = strip_meta(t)
        g = pa.TableGroupBy(t.select([group_col, col]), [group_col, col]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {group_col: g[group_col], col: g[col], "cnt": g["count_all"]}
        )

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby([group_col, col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def per_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(col, "ascending")])
        t2 = t.take(idx)
        v = t2[col].to_numpy(zero_copy_only=False)
        cum = t2["cnt"].to_numpy(zero_copy_only=False).cumsum()
        n = int(cum[-1])
        vals = []
        for q in qs:
            rank = max(int(np.ceil(q * n)) - 1, 0)
            i = int(np.searchsorted(cum, rank + 1, side="left"))
            vals.append(v[min(i, len(v) - 1)])
        gcol = t2[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table(
            {
                group_col: pa.array([gcol[0].as_py()] * len(qs), type=gcol.type),
                "q": pa.array(qs, type=pa.float64()),
                "value": pa.array(vals, type=t2[col].type),
            }
        )

    return hist.groupby(group_col).map_groups(per_group, batch_format="pyarrow")
