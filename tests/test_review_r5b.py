"""Regression tests for the second round-5 review pass:

1. ``_gather_sig_payload`` tolerates the zero-COLUMN blocks Ray 2.49
   materializes for fully-emptied blocks (the broadcast-sigs verify path's
   analog of the driver path's ``num_columns`` filter), including the
   all-empty fallback payload.
2. ``_valid_key_mask`` uses Kleene logic: a float key column carrying an
   Arrow NULL (not NaN) must be filtered even when every other row is
   valid — plain ``and_`` propagated the null and ``pc.all``'s skip-nulls
   fast path returned the table UNFILTERED.
3. ``cached_stage`` honors a class's ``CACHE_SLOTS`` bound so
   ObjectRef-keyed broadcast-payload stages can't pin 32 dead payloads per
   worker process.
4. ``_AttachStage`` keys its cache on (ref, key, values) only: probing one
   payload under two roles (PMI's w1/w2) reuses ONE instance.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from meresco_lucene_ray.functions.dedup import _distinct_ab_idx, _gather_sig_payload
from meresco_lucene_ray.functions.hashing import _STAGE_CACHE, cached_stage


def _sig_table(ids, blobs):
    return pa.table(
        {
            "__sid__": pa.array(ids, type=pa.int64()),
            "shingle_hashes": pa.array(blobs, type=pa.binary()),
        }
    )


def test_gather_sig_payload_skips_zero_column_blocks():
    h = np.arange(3, dtype="<u8").tobytes()
    t = _sig_table([7, 3], [h, h[:16]])
    p = _gather_sig_payload(pa.table({}), t, pa.table({}))
    assert p["sid"].tolist() == [3, 7]
    assert p["counts"].tolist() == [2, 3]
    assert p["vals"].dtype == np.uint64


def test_gather_sig_payload_all_empty_fallback():
    p = _gather_sig_payload(pa.table({}))
    assert p["sid"].size == 0 and p["vals"].size == 0
    assert p["starts"].size == 0 and p["counts"].size == 0


def test_valid_key_mask_arrow_null_in_float_keys():
    from meresco_lucene_ray.query.engine import _drop_invalid_keys, _valid_key_mask

    key = pa.array([1.0, None, 2.0], type=pa.float64())
    mask = _valid_key_mask(key)
    assert mask.null_count == 0, "Kleene mask must carry no nulls"
    assert mask.to_pylist() == [True, False, True]
    t = pa.table({"key": key, "cnt": pa.array([1, 1, 1], type=pa.int64())})
    out = _drop_invalid_keys(t)
    assert len(out) == 2 and out["key"].to_pylist() == [1.0, 2.0]
    # NaN and fully-valid fast path still behave
    t2 = pa.table({"key": pa.array([1.0, float("nan")]), "cnt": pa.array([1, 1])})
    assert _drop_invalid_keys(t2)["key"].to_pylist() == [1.0]
    t3 = pa.table({"key": pa.array([1.0, 2.0]), "cnt": pa.array([1, 1])})
    assert _drop_invalid_keys(t3) is t3


def test_cached_stage_per_class_slots():
    class Bounded:
        CACHE_SLOTS = 2

        def __init__(self, tag):
            self.tag = tag

    class Other:
        def __init__(self, tag):
            self.tag = tag

    for k in [k for k in _STAGE_CACHE if k[0] in (Bounded, Other)]:
        _STAGE_CACHE.pop(k)
    a = cached_stage(Bounded, 1)
    assert cached_stage(Bounded, 1) is a  # reuse
    cached_stage(Other, 1)
    cached_stage(Bounded, 2)
    cached_stage(Bounded, 3)  # evicts the oldest Bounded (tag 1)
    bounded = [k for k in _STAGE_CACHE if k[0] is Bounded]
    assert len(bounded) == 2
    assert {k[1][0] for k in bounded} == {2, 3}
    assert any(k[0] is Other for k in _STAGE_CACHE), "other classes untouched"
    assert cached_stage(Bounded, 1) is not a  # rebuilt after eviction


def test_attach_stage_shared_across_roles(ray_session):
    import ray

    from meresco_lucene_ray.functions.joins import _AttachStage

    ref = ray.put(
        {
            "w": np.array(["a", "b"], dtype=object),
            "cnt": np.array([10, 20], dtype=np.int64),
        }
    )
    for k in [k for k in _STAGE_CACHE if k[0] is _AttachStage]:
        _STAGE_CACHE.pop(k)
    st1 = cached_stage(_AttachStage, ref, "w", ("cnt",))
    st2 = cached_stage(_AttachStage, ref, "w", ("cnt",))
    assert st1 is st2
    t = pa.table({"w1": pa.array(["a", "x", "b"]), "w2": pa.array(["b", "b", "a"])})
    r1 = st1(t, "w1", ("c1",))
    r2 = st1(r1, "w2", ("c2",))
    assert r2["w1"].to_pylist() == ["a", "b"]
    assert r2["c1"].to_pylist() == [10, 20]
    assert r2["c2"].to_pylist() == [20, 10]
    assert len([k for k in _STAGE_CACHE if k[0] is _AttachStage]) == 1


def test_bitset_stages_tolerate_empty_schema_blocks(ray_session):
    """keys_of_dataset / semi_join_filter / broadcast_lookup_join over a
    dataset whose blocks include Ray 2.49's zero-column empty-schema blocks
    (a fully-emptied filter output) must not KeyError in their map stages."""
    import ray.data as rd

    from meresco_lucene_ray.join.bitsets import (
        broadcast_lookup_join,
        keys_of_dataset,
        semi_join_filter,
    )

    good = rd.from_arrow(pa.table({"k": pa.array([1, 3, 5], type=pa.int64())}))
    # a union with a dataset emptied by filter produces empty blocks
    emptied = rd.from_arrow(
        pa.table({"k": pa.array([9], type=pa.int64())})
    ).filter(lambda r: False).materialize()
    ds = good.union(emptied).materialize()

    kb = keys_of_dataset(ds, "k", size=8)
    assert np.flatnonzero(kb.materialize()).tolist() == [1, 3, 5]
    kept = semi_join_filter(ds, "k", kb).to_pandas()
    assert sorted(kept["k"]) == [1, 3, 5]
    out = broadcast_lookup_join(
        ds, "k", (np.array([1, 5]), np.array([10, 50])), "v"
    ).to_pandas()
    got = dict(zip(out["k"], out["v"]))
    assert got[1] == 10 and got[5] == 50 and np.isnan(got[3])

    # and the joins-module gathers over the same shape
    from meresco_lucene_ray.functions.joins import attach_small, gather_small

    p = gather_small(ds, ["k"])
    assert p["k"].tolist() == [1, 3, 5]
    small = rd.from_arrow(
        pa.table({"k": pa.array([3], type=pa.int64()), "w": pa.array([30], type=pa.int64())})
    ).materialize()
    out2 = attach_small(ds, small, "k", ["w"]).to_pandas()
    assert list(out2["k"]) == [3] and list(out2["w"]) == [30]


def test_attach_small_empty_rows_join_fallback(ray_session, monkeypatch):
    """The hash-join fallback with an EMPTY rows side returns a typed empty
    table instead of crashing inside acero on zero-column blocks."""
    import ray.data as rd

    from meresco_lucene_ray.functions.joins import attach_small

    rows = (
        rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()), "v": pa.array([7])}))
        .filter(lambda r: False)
        .materialize()
    )
    small = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], type=pa.int64()), "w": pa.array([10, 20])})
    ).materialize()
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "0")
    out = attach_small(rows, small, "k", ["w"])
    assert out.count() == 0
    assert "w" in out.schema().names


def test_distinct_ab_idx():
    a = np.array([3, 1, 3, 1, 2], dtype=np.int64)
    b = np.array([4, 2, 4, 2, 9], dtype=np.int64)
    idx = _distinct_ab_idx(a, b)
    assert list(zip(a[idx].tolist(), b[idx].tolist())) == [(1, 2), (2, 9), (3, 4)]
    empty = np.empty(0, dtype=np.int64)
    assert _distinct_ab_idx(empty, empty).size == 0
