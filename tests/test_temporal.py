"""sessionize + asof_join_broadcast edge cases (exact-gap boundary, ts ties,
unmatched left rows, cross-key isolation)."""

import numpy as np
import pyarrow as pa
import pytest


def _ts(us_list):
    return pa.array(np.asarray(us_list, dtype=np.int64), type=pa.timestamp("us"))


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_sessionize_gap_boundary(rd):
    from meresco_lucene_ray.functions.temporal import sessionize

    # gaps: exactly gap_us stays in-session (> breaks, not >=)
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1], type=pa.int64()),
            "ts": _ts([0, 100, 200, 301]),
            "eid": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    out_rows = (
        sessionize(rd.from_arrow(t), "k", "ts", gap_us=100, id_col="eid")
        .sort("session_start")
        .take_all()
    )
    assert [(r["session_start"], r["n_events"], r["duration_us"]) for r in out_rows] == [
        (0, 3, 200),  # 0,100,200 — gaps of exactly 100 keep the session
        (301, 1, 0),  # gap 101 > 100 breaks
    ]


def test_sessionize_per_key_isolation(rd):
    from meresco_lucene_ray.functions.temporal import sessionize

    t = pa.table(
        {
            "k": pa.array([1, 2, 1, 2], type=pa.int64()),
            "ts": _ts([0, 5, 10, 1000]),
            "eid": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    rows = sessionize(rd.from_arrow(t), "k", "ts", gap_us=100, id_col="eid").take_all()
    got = sorted((r["k"], r["session_start"], r["n_events"]) for r in rows)
    assert got == [(1, 0, 2), (2, 5, 1), (2, 1000, 1)]


def test_asof_join_basic_and_ties(rd):
    from meresco_lucene_ray.functions.temporal import asof_join_broadcast

    right = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": _ts([10, 20, 20, 15]),
        }
    )
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "ts": _ts([5, 20, 25, 14, 16, 100]),
            "lid": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        }
    )
    rows = asof_join_broadcast(
        rd.from_arrow(left), right, "k", "ts", out_col="m"
    ).take_all()
    got = {r["lid"]: r["m"] for r in rows}
    # lid 0: no right ts <= 5 → dropped; lid 3: k=2 ts 14 < 15 → dropped;
    # lid 5: key 3 absent → dropped
    assert got == {1: 20, 2: 20, 4: 15}


def test_asof_join_exact_equal_ts_matches(rd):
    from meresco_lucene_ray.functions.temporal import asof_join_broadcast

    right = pa.table({"k": pa.array([7], type=pa.int64()), "ts": _ts([50])})
    left = pa.table(
        {
            "k": pa.array([7, 7], type=pa.int64()),
            "ts": _ts([50, 49]),
            "lid": pa.array([0, 1], type=pa.int64()),
        }
    )
    rows = asof_join_broadcast(
        rd.from_arrow(left), right, "k", "ts", out_col="m"
    ).take_all()
    assert {r["lid"]: r["m"] for r in rows} == {0: 50}


def test_rolling_mean_matches_pandas_window(rd):
    from meresco_lucene_ray.functions.temporal import rolling_mean

    rng = np.random.default_rng(3)
    n = 200
    t = pa.table(
        {
            "u": pa.array(rng.integers(0, 5, n), type=pa.int64()),
            "ts": _ts(rng.integers(0, 1000, n).tolist()),
            "eid": pa.array(range(n), type=pa.int64()),
            "v": pa.array(rng.uniform(0, 100, n)),
        }
    )
    out = rolling_mean(rd.from_arrow(t), "u", "ts", "eid", "v", window=3).to_pandas()
    import pandas as pd

    df = t.to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    want = (
        df.groupby("u")["v"].rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    want = np.floor(want.to_numpy() * 10000 + 0.5) / 10000
    got = out.set_index("eid").loc[df["eid"]]["rolling_avg"].to_numpy()
    assert np.array_equal(got, want)


def test_rolling_mean_short_groups(rd):
    from meresco_lucene_ray.functions.temporal import rolling_mean

    t = pa.table(
        {
            "u": pa.array([1, 1, 2], type=pa.int64()),
            "ts": _ts([10, 20, 5]),
            "eid": pa.array([0, 1, 2], type=pa.int64()),
            "v": pa.array([4.0, 8.0, 7.0]),
        }
    )
    out = rolling_mean(rd.from_arrow(t), "u", "ts", "eid", "v", window=3).to_pandas()
    got = out.set_index("eid")["rolling_avg"]
    assert got[0] == 4.0 and got[1] == 6.0 and got[2] == 7.0
