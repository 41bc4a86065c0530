"""Property tests: the temporal operators against DuckDB on RANDOMIZED
event data — the oracle entries pin them on the synthetic corpus only,
where timestamp collisions, single-event sessions, empty windows and
duplicate as-of candidates are rare.  Hypothesis generates adversarial
small streams (few keys, colliding timestamps) and DuckDB's window/ASOF
machinery is the referee."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.functions.temporal import (
    asof_join_broadcast,
    rolling_mean,
    sessionize,
)

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key — few keys, many collisions
        st.integers(min_value=0, max_value=50),  # ts (us) — tiny range, ties likely
    ),
    min_size=1,
    max_size=40,
)


def _events_table(rows):
    keys, ts = zip(*rows)
    return pa.table(
        {
            "key": pa.array(keys, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()),
            "eid": pa.array(range(len(rows)), type=pa.int64()),
        }
    )


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_EVENTS, gap=st.integers(min_value=1, max_value=10))
def test_sessionize_matches_sql(ray_session, rows, gap):
    import ray.data as rd

    t = _events_table(rows)
    got = (
        sessionize(rd.from_arrow(t), "key", "ts", gap_us=gap, id_col="eid")
        .to_pandas()
        .sort_values(["key", "session_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", t)
    exp = con.execute(
        f"""
        WITH marked AS (
          SELECT key, ts,
                 CASE WHEN ts - lag(ts) OVER w > {gap}
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY key ORDER BY ts, eid)
        ), numbered AS (
          SELECT key, ts,
                 SUM(new_s) OVER (PARTITION BY key ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT key, MIN(ts) AS session_start,
               COUNT(*)::BIGINT AS n_events,
               (MAX(ts) - MIN(ts))::BIGINT AS duration_us
        FROM numbered GROUP BY key, sid
        ORDER BY key, session_start
        """
    ).df()
    con.close()
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["session_start"].tolist() == exp["session_start"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["duration_us"].tolist() == exp["duration_us"].tolist()


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=_EVENTS, right=_EVENTS)
def test_asof_join_matches_duckdb_asof(ray_session, left, right):
    import ray.data as rd

    lt, rt = _events_table(left), _events_table(right)
    # as-of needs unique (key, ts) on the right for a deterministic matched
    # VALUE; the matched TIMESTAMP is identical across duplicates, and the
    # operator returns the timestamp — so duplicates are fine as-is.
    got = asof_join_broadcast(
        rd.from_arrow(lt), rt, "key", "ts", out_col="asof_ts"
    ).to_pandas()
    if len(got) == 0:
        got = got.reindex(columns=["eid", "asof_ts"])  # Ray drops cols on empty
    got = got.sort_values(["eid"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    exp = con.execute(
        """
        SELECT l.eid, r.ts AS asof_ts
        FROM l ASOF JOIN (SELECT DISTINCT key, ts FROM r) r
          ON l.key = r.key AND l.ts >= r.ts
        ORDER BY l.eid
        """
    ).df()
    con.close()
    assert got["eid"].tolist() == exp["eid"].tolist()
    assert got["asof_ts"].tolist() == exp["asof_ts"].tolist()


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_EVENTS, window=st.integers(min_value=1, max_value=6))
def test_rolling_mean_matches_sql(ray_session, rows, window):
    import ray.data as rd

    t = _events_table(rows).append_column(
        "val", pa.array([(i * 37) % 101 for i in range(len(rows))], type=pa.int64())
    )
    got = (
        rolling_mean(rd.from_arrow(t), "key", "ts", "eid", "val", window)
        .to_pandas()
        .sort_values(["key", "ts", "eid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", t)
    exp = con.execute(
        f"""
        SELECT key, ts, eid,
               FLOOR(AVG(val) OVER (PARTITION BY key ORDER BY ts, eid
                     ROWS {window - 1} PRECEDING) * 10000 + 0.5) / 10000
               AS rolling_avg
        FROM ev ORDER BY key, ts, eid
        """
    ).df()
    con.close()
    assert got["eid"].tolist() == exp["eid"].tolist()
    assert np.allclose(got["rolling_avg"], exp["rolling_avg"], atol=1e-9)
