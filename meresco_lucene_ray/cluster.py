"""Clustering of top documents — DBSCAN over GeneralizedJaccard distances,
PageRank-ranked clusters.

Re-expresses the reference's result clustering (Q12):
- ``MerescoClusterer``: DBSCAN (eps, minPoints) over term-vector doc vectors
  of the top ``stop + clusterMoreRecords`` docs, per-field weights
  (/root/reference/src/org/meresco/lucene/search/MerescoClusterer.java:52-237);
- ``GeneralizedJaccardDistance``: 1 − Σmin/Σmax over weighted vectors
  (…/search/GeneralizedJaccardDistance.java);
- cluster ranking by 5 PageRank iterations, damping 0.85
  (…/search/PageRank.java:32-161) → representative + top docs + top terms;
- eps interpolation by result size (…/search/InterpolateEpsilon.java) —
  simplified here to a linear ramp, documented deviation.

This runs driver-side (or in one task) on ≤ k+clusterMoreRecords docs —
small data by construction, like the reference.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from .analysis import tokenize

CLUSTER_MORE_RECORDS = 100  # Lucene.java:302-305
PAGERANK_ITERATIONS = 5
PAGERANK_DAMPING = 0.85


def generalized_jaccard_distance(a: dict[str, float], b: dict[str, float]) -> float:
    """1 − Σ min(a_t, b_t) / Σ max(a_t, b_t); distance 1.0 when disjoint."""
    if not a or not b:
        return 1.0
    keys = set(a) | set(b)
    smin = sum(min(a.get(k, 0.0), b.get(k, 0.0)) for k in keys)
    smax = sum(max(a.get(k, 0.0), b.get(k, 0.0)) for k in keys)
    return 1.0 - (smin / smax if smax else 0.0)


def distance_matrix(vectors: list[dict[str, float]]) -> np.ndarray:
    n = len(vectors)
    d = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            d[i, j] = d[j, i] = generalized_jaccard_distance(vectors[i], vectors[j])
    return d


def dbscan(dist: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    """Plain-numpy DBSCAN over a precomputed distance matrix.

    Returns labels: -1 = noise, 0..k-1 = cluster ids."""
    n = dist.shape[0]
    labels = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    cluster = 0
    neighbors = [np.flatnonzero(dist[i] <= eps) for i in range(n)]
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        if neighbors[i].size < min_points:
            continue
        labels[i] = cluster
        seeds = list(neighbors[i])
        while seeds:
            j = seeds.pop()
            if labels[j] == -1:
                labels[j] = cluster
            if not visited[j]:
                visited[j] = True
                if neighbors[j].size >= min_points:
                    seeds.extend(k for k in neighbors[j] if not visited[k] or labels[k] == -1)
        cluster += 1
    return labels


def pagerank(similarity: np.ndarray, iterations: int = PAGERANK_ITERATIONS, damping: float = PAGERANK_DAMPING) -> np.ndarray:
    """PageRank over a (symmetric) similarity-weighted graph
    (PageRank.java:32-161): rank = (1−d)/n + d · Σ_j sim_ij·rank_j / deg_j."""
    n = similarity.shape[0]
    if n == 0:
        return np.zeros(0)
    deg = similarity.sum(axis=1)
    deg[deg == 0] = 1.0
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        rank = (1 - damping) / n + damping * (similarity.T @ (rank / deg))
    return rank


def interpolate_eps(eps: float, count: int, full_count: int = 100) -> float:
    """Eps interpolation by result size (InterpolateEpsilon.java, simplified):
    small result sets tighten eps linearly."""
    if full_count <= 0:
        return eps
    return eps * min(1.0, count / full_count)


@dataclass
class Cluster:
    label: int
    doc_indices: list[int]
    representative: int  # index of the PageRank-top doc
    top_terms: list[str] = field(default_factory=list)
    rank: float = 0.0


def term_vectors(texts: list[str], weight: float = 1.0) -> list[dict[str, float]]:
    """tf vectors from raw text through the frozen tokenizer (the reference
    reads stored Lucene term vectors; we re-derive with the same analyzer)."""
    out = []
    for t in texts:
        c = Counter(tokenize(t))
        out.append({k: v * weight for k, v in c.items()})
    return out


def cluster_texts(
    texts: list[str],
    eps: float = 0.4,
    min_points: int = 1,
    interpolate_full_count: int | None = None,
) -> list[Cluster]:
    """Cluster documents; returns clusters ranked by their representative's
    PageRank, each with top terms (the clusterTopDocsResponse analog,
    Lucene.java:365-414)."""
    vecs = term_vectors(texts)
    dist = distance_matrix(vecs)
    if interpolate_full_count:
        eps = interpolate_eps(eps, len(texts), interpolate_full_count)
    labels = dbscan(dist, eps, min_points)
    sim = 1.0 - dist
    np.fill_diagonal(sim, 0.0)
    ranks = pagerank(sim)
    clusters: list[Cluster] = []
    for lab in sorted(set(labels.tolist()) - {-1}):
        idx = np.flatnonzero(labels == lab)
        rep = int(idx[np.argmax(ranks[idx])])
        merged: Counter = Counter()
        for i in idx:
            merged.update(vecs[int(i)])
        top_terms = [t for t, _ in merged.most_common(10)]
        clusters.append(
            Cluster(
                label=int(lab),
                doc_indices=[int(i) for i in idx],
                representative=rep,
                top_terms=top_terms,
                rank=float(ranks[idx].max()),
            )
        )
    clusters.sort(key=lambda c: -c.rank)
    return clusters
