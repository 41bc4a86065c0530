"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix, per-batch partial top-k, tiny final merge (never a
full sort of the corpus).  Scale path: LSH-bucketed variant — random
hyperplane signatures prune the corpus to matching buckets before scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import list_col_to_matrix, strip_meta


def brute_force_topk(ds, query_vec, k=10, vec_col="embedding", id_col="vec_id", exclude_ids=()):
    """Exact cosine top-k: per-batch matmul + partial top-k → driver merge.

    Returns a pyarrow Table (id_col, cosine) sorted cosine desc, id asc."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    ref = ray.put(q)
    excl = set(int(x) for x in exclude_ids)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = list_col_to_matrix(batch[vec_col], dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ qv
        if excl:
            keep = ~np.isin(ids, np.fromiter(excl, dtype=ids.dtype))
            ids, sims = ids[keep], sims[keep]
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]), "cosine": pa.array(sims[order])})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({id_col: pa.array([], type=pa.int64()), "cosine": pa.array([], type=pa.float64())})
    ids = np.asarray([r[id_col] for r in parts])
    sims = np.asarray([r["cosine"] for r in parts])
    order = np.lexsort((ids, -sims))[:k]
    return pa.table({id_col: pa.array(ids[order]), "cosine": pa.array(sims[order])})


class LshBucketer:
    """Random-hyperplane LSH signature per vector (the IVF/LSH scale path:
    bucket once at ingest, probe only matching buckets at query time)."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col = vec_col

    def signature(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return (bits.astype(np.int64) * weights).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        mat = list_col_to_matrix(batch[self.vec_col], dtype=np.float64)
        return batch.append_column("lsh_bucket", pa.array(self.signature(mat)))


def kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Plain seeded Lloyd's k-means on a driver-side SAMPLE (the coarse
    quantizer training step of an IVF index — training is O(sample), never
    O(corpus)).  Returns (n_centroids, dim) float64 centroids."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(n_centroids, n)
    centroids = sample[rng.choice(n, size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class IvfAssigner:
    """map_batches stage: nearest-centroid id per vector (centroids broadcast
    via ray.put — one object-store entry, read zero-copy per task)."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray

        self.centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        mat = list_col_to_matrix(batch[self.vec_col], dtype=np.float64)
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2; argmin over c drops ||x||^2
        scores = mat @ self.centroids.T - 0.5 * (self.centroids**2).sum(axis=1)[None, :]
        return batch.append_column(
            "ivf_cell", pa.array(scores.argmax(axis=1).astype(np.int64))
        )


def ivf_topk(
    ds, query_vec, k=10, vec_col="embedding", id_col="vec_id",
    n_centroids=16, n_probe=4, sample_size=2048, iters=10, seed=5,
    centroids=None, exclude_ids=(),
):
    """IVF (inverted-file) approximate top-k — the k-means counterpart of
    ``lsh_topk``: train a coarse quantizer on a driver-side sample (or take
    a pre-trained one via ``centroids`` — IVF quantizers normally train
    offline, once, and get reused across queries), assign every vector to
    its nearest centroid in one map_batches pass (materialized once), then
    score ONLY the ``n_probe`` cells nearest the query.  At 100 TB the
    assignment doubles as the partitioning key for parquet layout, so
    probes prune at the read."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    if centroids is None:
        sample = np.asarray(
            [r[vec_col] for r in ds.take(sample_size)], dtype=np.float64
        )
        centroids = kmeans_fit(sample, n_centroids, iters, seed)
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(centroids)
    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_args=(ref, vec_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    ).materialize()
    qd = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(qd, kind="stable")[: max(1, n_probe)].tolist())

    def in_probe(batch: pa.Table) -> pa.Table:
        mask = np.isin(
            batch["ivf_cell"].to_numpy(zero_copy_only=False),
            np.fromiter(probe, dtype=np.int64),
        )
        return batch.filter(pa.array(mask))

    candidates = assigned.map_batches(in_probe, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, vec_col, id_col, exclude_ids)


def lsh_topk(
    ds, query_vec, k=10, vec_col="embedding", id_col="vec_id", n_planes=8, seed=11,
    min_candidates: int | None = None,
):
    """Multiprobe LSH-pruned cosine top-k.

    The bucketed dataset is MATERIALIZED once (the round-1 version re-ran the
    whole bucketing pipeline for its size check); bucket sizes come from one
    small aggregate, and probes expand outward by Hamming distance from the
    query signature until ≥ max(k, min_candidates) vectors are covered —
    graceful recall growth instead of the all-or-nothing brute-force
    fallback.  Only the probed buckets are ever scored."""
    from ray.data.aggregate import Count

    q = np.asarray(query_vec, dtype=np.float64)
    min_cand = min_candidates if min_candidates is not None else 4 * k
    bucketer = LshBucketer(q.size, n_planes, seed, vec_col)
    qsig = int(bucketer.signature(q[None, :])[0])
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_args=(q.size, n_planes, seed, vec_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    ).materialize()
    sizes = bucketed.groupby("lsh_bucket").aggregate(Count(alias_name="n")).to_pandas()
    buckets = sizes["lsh_bucket"].to_numpy().astype(np.int64)
    counts = sizes["n"].to_numpy().astype(np.int64)
    # multiprobe order: Hamming distance to the query signature, bucket asc
    ham = np.bitwise_count(np.bitwise_xor(buckets, np.int64(qsig))) if hasattr(
        np, "bitwise_count"
    ) else np.array([bin(int(b) ^ qsig).count("1") for b in buckets])
    order = np.lexsort((buckets, ham))
    csum = np.cumsum(counts[order])
    need = int(np.searchsorted(csum, max(k, min_cand))) + 1
    probe = set(buckets[order[:need]].tolist())

    def in_probe(batch: pa.Table) -> pa.Table:
        mask = np.isin(
            batch["lsh_bucket"].to_numpy(zero_copy_only=False),
            np.fromiter(probe, dtype=np.int64),
        )
        return batch.filter(pa.array(mask))

    candidates = bucketed.map_batches(in_probe, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, vec_col, id_col)


def label_centroids(ds, vec_col: str = "embedding", label_col: str = "label"):
    """Per-label mean embedding — the class-centroid table (label → mean
    vector) behind centroid classifiers, IVF seeding and drift monitoring.

    Scale shape: each batch folds to ONE (label, partial-sum vector, count)
    row per label present (zero-copy list→matrix, add.reduceat over the
    label-sorted rows); a groupby(label) final sums the few partials and
    explodes to (label, dim, mean) rows.  Nothing bigger than
    labels × dim crosses the wire after the map side.
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        t = strip_meta(t)
        m = list_col_to_matrix(t[vec_col], dtype=np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.ones(lab_s.size, dtype=bool)
        starts[1:] = lab_s[1:] != lab_s[:-1]
        seg = np.flatnonzero(starts)
        sums = np.add.reduceat(m[order], seg, axis=0)
        cnts = np.diff(np.append(seg, lab_s.size))
        d = m.shape[1]
        flat = pa.array(sums.ravel(), type=pa.float64())
        offs = pa.array(np.arange(len(seg) + 1, dtype=np.int32) * d)
        return pa.table(
            {
                label_col: pa.array(lab_s[seg]),
                "s": pa.ListArray.from_arrays(offs, flat),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        m = list_col_to_matrix(t["s"], dtype=np.float64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = m.sum(axis=0) / cnt.sum()
        mean = np.floor(mean * 10000 + 0.5) / 10000
        d = mean.size
        lab = t[label_col][0].as_py()
        return pa.table(
            {
                label_col: pa.array([lab] * d, type=t[label_col].type),
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mean": pa.array(mean),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(label_col)
        .map_groups(final, batch_format="pyarrow")
    )
