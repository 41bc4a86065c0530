"""topk_per_group: map-side partial top-k + per-group final reduction."""

import numpy as np
import pandas as pd
import pyarrow as pa

from meresco_lucene_ray.functions.groups import _partial_topk_table, topk_per_group


def _pandas_topk(df, group, order, k, descending=True, tie=None):
    by = [group, order] + ([tie] if tie else [])
    asc = [True, not descending] + ([True] if tie else [])
    return (
        df.sort_values(by, ascending=asc, kind="mergesort")
        .groupby(group, sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def test_partial_topk_table_single_batch():
    t = pa.table(
        {
            "g": ["a", "b", "a", "a", "b", "c"],
            "v": [5, 1, 9, 7, 3, 2],
            "id": [0, 1, 2, 3, 4, 5],
        }
    )
    out = _partial_topk_table(t, "g", "v", 2, True, "id").to_pandas()
    exp = {("a", 9), ("a", 7), ("b", 3), ("b", 1), ("c", 2)}
    assert set(zip(out["g"], out["v"])) == exp


def test_partial_topk_ascending_and_ties_resolved_by_tie_col():
    t = pa.table({"g": ["x"] * 4, "v": [2, 2, 1, 2], "id": [30, 10, 99, 20]})
    out = _partial_topk_table(t, "g", "v", 2, False, "id").to_pandas()
    # ascending: v=1 first, then the v=2 with the smallest id
    assert sorted(zip(out["v"], out["id"])) == [(1, 99), (2, 10)]


def test_topk_per_group_matches_pandas_across_many_blocks(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 17, size=n).astype(str),
            "v": rng.integers(0, 50, size=n),
            "id": np.arange(n),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    out = (
        topk_per_group(ds, "g", "v", k=4, descending=True, tie_col="id")
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = _pandas_topk(df, "g", "v", 4, True, "id")
    pd.testing.assert_frame_equal(
        out[["g", "v", "id"]].astype({"v": np.int64, "id": np.int64}),
        exp[["g", "v", "id"]].astype({"v": np.int64, "id": np.int64}),
    )


def test_topk_per_group_k_larger_than_group(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3], "id": [0, 1, 2]})
    out = topk_per_group(rd.from_pandas(df), "g", "v", k=10, tie_col="id").to_pandas()
    assert len(out) == 3


def test_exact_quantiles_match_duckdb_disc(ray_session):
    import duckdb
    import ray.data as rd

    from meresco_lucene_ray.functions.groups import exact_quantiles

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 40, size=777)
    df = pd.DataFrame({"x": vals})
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    got = exact_quantiles(rd.from_pandas(df).repartition(8), "x", qs)
    con = duckdb.connect()
    con.register("t", df)
    for q, v in got:
        (exp,) = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()
        assert v == exp, (q, v, exp)


def test_exact_quantiles_single_value(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.groups import exact_quantiles

    got = exact_quantiles(rd.from_pandas(pd.DataFrame({"x": [7]})), "x", (0.0, 0.5, 1.0))
    assert [v for _, v in got] == [7, 7, 7]


def test_common_shingle_frac_matches_pandas_reference(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.textstats import common_shingle_frac

    texts = [
        "the license header text",   # shares "the license" etc. with below
        "the license header text",
        "the license header text",
        "unique content here now",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    out = (
        common_shingle_frac(rd.from_pandas(df).repartition(3), "text", "doc_id", n=2, min_df=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 0-2: every 2-gram appears in 3 docs -> frac 1.0
    assert list(out.loc[out["doc_id"] < 3, "frac"]) == [1.0, 1.0, 1.0]
    # doc 3: no shingle reaches df=3
    assert float(out.loc[out["doc_id"] == 3, "frac"].iloc[0]) == 0.0
    # empty doc contributes its single '' shingle (df=1 -> not common)
    assert int(out.loc[out["doc_id"] == 4, "total_shingles"].iloc[0]) == 1


def test_grouped_quantiles_matches_pandas(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.groups import grouped_quantiles

    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c"], size=400).tolist()
    v = rng.integers(0, 50, size=400).tolist()
    ds = rd.from_arrow(pa.table({"g": g, "v": pa.array(v, type=pa.int64())}))
    out = grouped_quantiles(ds, "g", "v", (0.25, 0.5, 0.9)).to_pandas()
    df = pd.DataFrame({"g": g, "v": v})
    for (grp, q), val in zip(zip(out["g"], out["q"]), out["value"]):
        xs = np.sort(df[df["g"] == grp]["v"].to_numpy())
        rank = max(int(np.ceil(q * len(xs))) - 1, 0)
        assert val == xs[rank], (grp, q, val, xs[rank])
    assert len(out) == 9


def test_grouped_quantiles_single_value_group(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.groups import grouped_quantiles

    ds = rd.from_arrow(pa.table({"g": ["x", "x", "y"], "v": pa.array([5, 5, 9], type=pa.int64())}))
    out = grouped_quantiles(ds, "g", "v", (0.5,)).to_pandas().sort_values("g")
    assert list(out["value"]) == [5, 9]
