"""Property tests: grouped top-k and the histogram-based exact quantiles
against DuckDB on randomized inputs — heavy duplicate values and tiny
groups, the cases where rank/tie conventions diverge silently."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.functions.groups import (
    exact_quantiles,
    grouped_quantiles,
    topk_per_group,
)

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group
        st.integers(min_value=0, max_value=9),  # value — many duplicates
    ),
    min_size=1,
    max_size=40,
)

_QS = (0.0, 0.25, 0.5, 0.9, 1.0)


def _table(rows):
    g, v = zip(*rows)
    return pa.table(
        {
            "grp": pa.array(g, type=pa.int64()),
            "val": pa.array(v, type=pa.int64()),
            "tie": pa.array(range(len(rows)), type=pa.int64()),
        }
    )


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_ROWS, k=st.integers(min_value=1, max_value=5), desc=st.booleans())
def test_topk_per_group_matches_sql(ray_session, rows, k, desc):
    import ray.data as rd

    t = _table(rows)
    got = (
        topk_per_group(rd.from_arrow(t), "grp", "val", k, descending=desc, tie_col="tie")
        .to_pandas()
        .sort_values(["grp", "tie"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    direction = "DESC" if desc else "ASC"
    exp = con.execute(
        f"""
        SELECT grp, val, tie FROM t
        QUALIFY row_number() OVER (PARTITION BY grp ORDER BY val {direction}, tie ASC) <= {k}
        ORDER BY grp, tie
        """
    ).df()
    con.close()
    assert got["tie"].tolist() == exp["tie"].tolist()
    assert got["val"].tolist() == exp["val"].tolist()


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_ROWS)
def test_exact_quantiles_match_duckdb(ray_session, rows):
    import ray.data as rd

    t = _table(rows)
    got = dict(exact_quantiles(rd.from_arrow(t), "val", _QS))
    con = duckdb.connect()
    con.register("t", t)
    for q in _QS:
        exp = con.execute(f"SELECT quantile_disc(val, {q}) FROM t").fetchone()[0]
        assert got[q] == exp, (q, got[q], exp)
    con.close()


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_ROWS)
def test_grouped_quantiles_match_duckdb(ray_session, rows):
    import ray.data as rd

    t = _table(rows)
    got = (
        grouped_quantiles(rd.from_arrow(t), "grp", "val", _QS)
        .to_pandas()
        .sort_values(["grp", "q"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        f"""
        SELECT grp, UNNEST({list(_QS)}) AS q,
               UNNEST(quantile_disc(val, {list(_QS)})) AS value
        FROM t GROUP BY grp ORDER BY grp, q
        """
    ).df()
    con.close()
    assert got["grp"].tolist() == exp["grp"].tolist()
    assert np.allclose(got["q"], exp["q"])
    assert got["value"].tolist() == exp["value"].tolist()
