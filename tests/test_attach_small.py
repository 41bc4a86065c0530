"""attach_small / broadcast_attach: the size-gated broadcast inner attach
used by the textstats pipelines (tfidf/unigram-logprob/PMI doc-freq sides).

Pins three things: (1) broadcast path ≡ join path row-for-row, (2) the
dual-role probe (one payload probed under two column roles, as PMI does
for w1/w2), (3) string keys — the former searchsorted path degraded to
Python object comparisons on strings; pc.index_in must not.
"""

import pyarrow as pa
import pytest

from meresco_lucene_ray.functions.joins import (
    attach_small,
    broadcast_attach,
    gather_small_ref,
)


def _rows():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "term": pa.array(["a", "b", "c", "a", "zz"]),
                "tf": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            }
        )
    )


def _small():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "term": pa.array(["b", "a"]),  # deliberately unsorted
                "df": pa.array([20, 10], type=pa.int64()),
            }
        )
    ).materialize()


def _canon(out):
    df = out.to_pandas().sort_values(["term", "tf"]).reset_index(drop=True)
    return list(map(tuple, df[["term", "tf", "df"]].itertuples(index=False)))


EXPECTED = [("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]


def test_broadcast_path_matches_join_path(ray_session, monkeypatch):
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "1000")
    bcast = _canon(attach_small(_rows(), _small(), "term", ["df"]))
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "0")
    joined = _canon(attach_small(_rows(), _small(), "term", ["df"]))
    assert bcast == EXPECTED
    assert joined == EXPECTED


def test_dual_role_probe(ray_session):
    import ray.data as rd

    ref = gather_small_ref(_small(), ["term", "df"])
    pairs = rd.from_arrow(
        pa.table(
            {
                "w1": pa.array(["a", "b", "zz", "a"]),
                "w2": pa.array(["b", "zz", "a", "a"]),
            }
        )
    )
    out = broadcast_attach(pairs, "term", ref, ["df"], probe_col="w1", out_cols=["c1"])
    out = broadcast_attach(out, "term", ref, ["df"], probe_col="w2", out_cols=["c2"])
    df = out.to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    # row ("b","zz") drops at the w2 probe; ("zz","a") drops at the w1 probe
    assert list(map(tuple, df.itertuples(index=False))) == [
        ("a", "a", 10, 10),
        ("a", "b", 10, 20),
    ]


def test_empty_small_side(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"term": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
    ).materialize()
    out = attach_small(_rows(), empty, "term", ["df"])
    assert out.count() == 0


def test_null_keys_never_match(ray_session, monkeypatch):
    """SQL inner-join semantics across the gate: a NULL key in the small side
    must match nothing (pc.index_in would match null-to-null), and a NULL
    probe row drops on both paths."""
    import ray.data as rd

    rows = rd.from_arrow(
        pa.table(
            {
                "term": pa.array(["a", None, "b", None]),
                "tf": pa.array([1, 2, 3, 4], type=pa.int64()),
            }
        )
    ).materialize()
    small = rd.from_arrow(
        pa.table(
            {
                "term": pa.array(["a", None]),
                "df": pa.array([10, 99], type=pa.int64()),
            }
        )
    ).materialize()

    def canon(out):
        df = out.to_pandas().sort_values(["term", "tf"]).reset_index(drop=True)
        return list(map(tuple, df[["term", "tf", "df"]].itertuples(index=False)))

    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "1000")
    bcast = canon(attach_small(rows, small, "term", ["df"]))
    assert bcast == [("a", 1, 10)]
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "0")
    assert canon(attach_small(rows, small, "term", ["df"])) == bcast


def test_nullable_int_small_keys(ray_session, monkeypatch):
    """A nullable int64 key column gathers to float64+NaN (to_numpy); the NaN
    payload rows must not capture any probe, and valid keys still match
    through the int->float cast."""
    import ray.data as rd

    rows = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], type=pa.int64()), "v": pa.array([7, 8, 9])})
    ).materialize()
    small = rd.from_arrow(
        pa.table(
            {"k": pa.array([2, None], type=pa.int64()), "name": pa.array(["two", "ghost"])}
        )
    ).materialize()
    monkeypatch.setenv("MLR_ATTACH_BCAST_MAX", "1000")
    out = attach_small(rows, small, "k", ["name"]).to_pandas()
    assert list(out["k"]) == [2] and list(out["name"]) == ["two"]


def test_semi_anti_null_probes(ray_session):
    """broadcast_semi: an object-dtype None probe must not hit a None in the
    payload (None == None is elementwise True in numpy); broadcast_anti keeps
    the null-probe row (null never matches the set)."""
    import ray.data as rd

    from meresco_lucene_ray.functions.joins import broadcast_anti, broadcast_semi

    rows = rd.from_arrow(
        pa.table(
            {
                "term": pa.array(["a", None, "b"]),
                "tf": pa.array([1, 2, 3], type=pa.int64()),
            }
        )
    ).materialize()
    small = rd.from_arrow(pa.table({"term": pa.array(["a", None])})).materialize()
    ref = gather_small_ref(small, ["term"])
    kept = broadcast_semi(rows, "term", ref).to_pandas()
    assert list(kept["tf"]) == [1]
    dropped = broadcast_anti(rows, "term", ref).to_pandas().sort_values("tf")
    assert list(dropped["tf"]) == [2, 3]


def test_int_keys_with_type_mismatch(ray_session):
    import ray.data as rd

    rows = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], type=pa.int32()), "v": pa.array([7, 8, 9])})
    )
    small = rd.from_arrow(
        pa.table({"k": pa.array([2], type=pa.int64()), "name": pa.array(["two"])})
    ).materialize()
    out = attach_small(rows, small, "k", ["name"]).to_pandas()
    assert list(out["k"]) == [2] and list(out["name"]) == ["two"]
