"""weighted_sample (A-Res deterministic weighted sampling) and
label_centroids (per-label mean embedding) against brute-force references."""

import math

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _ares_key(doc_id: int, w: float, seed: int = 11) -> float:
    from meresco_lucene_ray.functions.textstats import hash_str

    h = hash_str(f"{seed}:{doc_id}") & ((1 << 53) - 1)
    u = (h + 1.0) / float(1 << 53)
    return math.floor(math.log(u) / w * 10000 + 0.5) / 10000


def test_weighted_sample_matches_bruteforce(rd):
    from meresco_lucene_ray.functions.curation import weighted_sample

    n = 300
    rng = np.random.default_rng(5)
    w = rng.integers(1, 500, n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), type=pa.int64()), "n_chars": pa.array(w)})
    )
    out = weighted_sample(ds, "doc_id", "n_chars", k=20, seed=11).to_pandas()
    ref = sorted(
        ((_ares_key(i, float(w[i])), i) for i in range(n)), key=lambda x: (-x[0], x[1])
    )[:20]
    assert list(zip(out["key"], out["doc_id"])) == ref
    # weight bias sanity: sampled mean weight should exceed population mean
    assert out["n_chars"].mean() > w.mean()


def test_weighted_sample_deterministic_across_runs(rd):
    from meresco_lucene_ray.functions.curation import weighted_sample

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), type=pa.int64()),
                "n_chars": pa.array([1 + (i % 7) for i in range(100)], type=pa.int64()),
            }
        )
    )
    a = weighted_sample(ds, "doc_id", "n_chars", k=10).to_pandas()
    b = weighted_sample(ds, "doc_id", "n_chars", k=10).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])


def test_label_centroids_matches_numpy(rd):
    from meresco_lucene_ray.functions.ann import label_centroids

    rng = np.random.default_rng(9)
    n, d = 240, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 4, n).astype(np.int32)
    flat = pa.array(m.ravel().astype(np.float32), type=pa.float32())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * d)
    t = pa.table(
        {"embedding": pa.ListArray.from_arrays(offs, flat), "label": pa.array(lab)}
    )
    out = label_centroids(rd.from_arrow(t), "embedding", "label").to_pandas()
    assert len(out) == 4 * d
    for g in range(4):
        want = m[lab == g].astype(np.float64).mean(axis=0)
        want = np.floor(want * 10000 + 0.5) / 10000
        got = out[out["label"] == g].sort_values("dim")["mean"].to_numpy()
        assert np.allclose(got, want, atol=1e-9), g
