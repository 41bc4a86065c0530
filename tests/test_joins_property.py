"""Property test: the size-gated broadcast paths in ``functions/joins.py``
agree with the hash-join fallback AND with SQL (DuckDB) join semantics on
randomized inputs — including NULL keys (which must match nothing on either
side), duplicate probe keys, empty sides, and string/int key types.

The broadcast fast paths and the join fallback are independent
implementations of the same contract; the oracle gate only exercises them
on the synthetic corpus, where null keys are rare.  This pins the contract
adversarially (the round-5 review found three null-semantics divergences
exactly here)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.functions.joins import (
    attach_small,
    broadcast_anti,
    broadcast_semi,
    gather_small_ref,
)

# a tiny key universe forces collisions, duplicates, and misses
_STR_KEYS = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d", "e"]))
_INT_KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=6))


def _tables(big_keys, small_keys, typ):
    big = pa.table(
        {
            "k": pa.array(big_keys, type=typ),
            "v": pa.array(range(len(big_keys)), type=pa.int64()),
        }
    )
    # small side must have UNIQUE keys (dimension-table contract); keep the
    # first occurrence of each (None kept too — the contract under test)
    seen, idx = set(), []
    for i, k in enumerate(small_keys):
        if k not in seen:
            seen.add(k)
            idx.append(i)
    small = pa.table(
        {
            "k": pa.array([small_keys[i] for i in idx], type=typ),
            "w": pa.array([i * 10 for i in idx], type=pa.int64()),
        }
    )
    return big, small


def _canon(t: pa.Table):
    df = t.to_pandas()
    cols = sorted(df.columns)
    rows = map(tuple, df[cols].astype(object).where(df[cols].notna(), None).itertuples(index=False))
    return sorted(rows, key=lambda r: [(v is None, v) for v in r])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big_keys=st.lists(_STR_KEYS, min_size=0, max_size=12),
    small_keys=st.lists(_STR_KEYS, min_size=0, max_size=6),
    typ_name=st.sampled_from(["string", "int64"]),
)
def test_attach_semi_anti_match_sql(ray_session, monkeypatch, big_keys, small_keys, typ_name):
    import ray.data as rd

    typ = pa.string() if typ_name == "string" else pa.int64()
    if typ_name == "int64":
        big_keys = [None if k is None else hash(k) % 7 if isinstance(k, str) else k for k in big_keys]
        small_keys = [None if k is None else hash(k) % 7 if isinstance(k, str) else k for k in small_keys]
    big_t, small_t = _tables(big_keys, small_keys, typ)
    big = rd.from_arrow(big_t).materialize()
    small = rd.from_arrow(small_t).materialize()

    con = duckdb.connect()
    con.register("big", big_t)
    con.register("small", small_t)
    sql_inner = _canon(con.execute("SELECT b.k, b.v, s.w FROM big b JOIN small s USING (k)").arrow())
    sql_semi = _canon(con.execute("SELECT k, v FROM big b WHERE EXISTS (SELECT 1 FROM small s WHERE s.k = b.k)").arrow())
    sql_anti = _canon(con.execute("SELECT k, v FROM big b WHERE NOT EXISTS (SELECT 1 FROM small s WHERE s.k = b.k)").arrow())
    con.close()

    # broadcast path
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "1000")
    assert _canon(attach_small(big, small, "k", ["w"]).to_pandas().pipe(pa.Table.from_pandas)) == sql_inner
    # hash-join fallback
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "0")
    assert _canon(attach_small(big, small, "k", ["w"]).to_pandas().pipe(pa.Table.from_pandas)) == sql_inner

    ref = gather_small_ref(small, ["k"])
    assert _canon(broadcast_semi(big, "k", ref).to_pandas().pipe(pa.Table.from_pandas)) == sql_semi
    assert _canon(broadcast_anti(big, "k", ref).to_pandas().pipe(pa.Table.from_pandas)) == sql_anti


@pytest.mark.parametrize("typ", [pa.float64()])
def test_attach_nan_float_keys_match_fallback(ray_session, monkeypatch, typ):
    """Float keys with real NaN: both gate sides must agree (DuckDB treats
    NaN as an ordinary comparable value, so SQL is not the referee here —
    the two engine paths just must not diverge from each other)."""
    import ray.data as rd

    big_t = pa.table(
        {
            "k": pa.array([1.0, float("nan"), 2.0, None], type=typ),
            "v": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    small_t = pa.table(
        {
            "k": pa.array([2.0, float("nan")], type=typ),
            "w": pa.array([20, 99], type=pa.int64()),
        }
    )
    big = rd.from_arrow(big_t).materialize()
    small = rd.from_arrow(small_t).materialize()
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "1000")
    bcast = _canon(attach_small(big, small, "k", ["w"]).to_pandas().pipe(pa.Table.from_pandas))
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "0")
    join = _canon(attach_small(big, small, "k", ["w"]).to_pandas().pipe(pa.Table.from_pandas))
    assert bcast == join == [(2.0, 2, 20)]
