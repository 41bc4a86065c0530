"""broadcast_lookup_join: dict path vs array-pair path (J6 support map).

The array-pair form is the scale path — the driver never builds a Python
dict (~100 B/key); keys/values ship as numpy arrays straight from Arrow.
"""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.join import broadcast_lookup_join


def _orders_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 13], type=pa.int64()),
                "o_custkey": pa.array([2, 1, 9, 2], type=pa.int64()),
            }
        )
    )


EXPECTED = {10: "bob", 11: "alice", 12: "", 13: "bob"}


def _result_map(out):
    t = out.to_pandas()
    return dict(zip(t["o_orderkey"], t["c_name"]))


def test_dict_path(ray_session):
    out = broadcast_lookup_join(
        _orders_ds(), "o_custkey", {1: "alice", 2: "bob"}, "c_name", default=""
    )
    assert _result_map(out) == EXPECTED


def test_array_pair_path_unsorted_numpy(ray_session):
    # deliberately unsorted keys: the join must sort internally
    keys = np.array([2, 1], dtype=np.int64)
    vals = np.array(["bob", "alice"], dtype=object)
    out = broadcast_lookup_join(_orders_ds(), "o_custkey", (keys, vals), "c_name", default="")
    assert _result_map(out) == EXPECTED


def test_array_pair_path_arrow_chunked(ray_session):
    cust = pa.table(
        {"k": pa.array([1, 2], type=pa.int64()), "v": pa.array(["alice", "bob"])}
    )
    out = broadcast_lookup_join(
        _orders_ds(),
        "o_custkey",
        (cust["k"].combine_chunks(), cust["v"].combine_chunks()),
        "c_name",
        default="",
    )
    assert _result_map(out) == EXPECTED


def test_empty_mapping_with_default(ray_session):
    """An empty broadcast side (the J6 small side matched zero rows) must
    yield the default for every row, not crash on the null-type column."""
    out = broadcast_lookup_join(_orders_ds(), "o_custkey", {}, "c_name", default="")
    assert _result_map(out) == {10: "", 11: "", 12: "", 13: ""}


def test_matched_null_value_keeps_null(ray_session):
    """default applies to UNMATCHED keys only — a key whose mapping value
    is legitimately null keeps its null (the object-array semantics)."""
    keys = np.array([1, 2], dtype=np.int64)
    vals = np.array(["alice", None], dtype=object)
    out = broadcast_lookup_join(
        _orders_ds(), "o_custkey", (keys, vals), "c_name", default="unknown"
    )
    m = _result_map(out)
    assert m[11] == "alice"
    assert m[12] == "unknown"          # unmatched -> default
    assert m[10] is None or (m[10] != m[10])  # matched null stays null
    assert m[13] is None or (m[13] != m[13])
