"""Clustering of top documents — DBSCAN over GeneralizedJaccard distances,
PageRank-ranked clusters.

Re-expresses the reference's result clustering (Q12):
- ``ClusterConfig`` / ``ClusterStrategy`` / ``ClusterField``: multi-strategy
  configuration with per-field weights and filter values
  (/root/reference/src/org/meresco/lucene/ClusterConfig.java,
  ClusterStrategy.java, ClusterField.java);
- ``MerescoClusterer``: strategies sorted most-filters-first, each doc
  collected by the FIRST strategy whose field filters all match; DBSCAN
  (eps, minPoints, commons-math semantics) per strategy over weighted
  term-vector doc vectors
  (…/search/MerescoClusterer.java:52-237);
- ``GeneralizedJaccardDistance``: 1 − Σmin/Σmax over weighted vectors
  (…/search/GeneralizedJaccardDistance.java);
- cluster ranking by 5 PageRank iterations over the BIPARTITE doc↔term
  graph, damping 0.85, commit PR₀ = (1−d) + d·PR₁
  (…/search/PageRank.java:32-161) → top docs + top terms per cluster;
- exact eps interpolation ``eps·(totalHits−sliceSize)/clusterMoreRecords``
  clamped to [0, eps] (…/search/InterpolateEpsilon.java:31-34).

This runs driver-side (or in one task) on ≤ k+clusterMoreRecords docs —
small data by construction, like the reference.  The legacy single-strategy
``cluster_texts`` entry point (doc-doc similarity PageRank) is kept for the
golden-pinned ``cluster_topdocs`` driver entry.
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

# ---------------------------------------------------------------------------
# Multi-strategy parity layer (ClusterConfig.java / ClusterStrategy.java /
# MerescoClusterer.java / PageRank.java — exact semantics)
# ---------------------------------------------------------------------------


@dataclass
class ClusterField:
    """ClusterField.java: a clustering field with weight + optional filter."""

    fieldname: str
    weight: float = 1.0
    filter_value: str | None = None


@dataclass
class ClusterStrategy:
    """ClusterStrategy.java: (eps, minPoints) + weighted fields.  Fields with
    weight 0.0 are dropped (ClusterStrategy.addField)."""

    clustering_eps: float
    clustering_min_points: int
    fields: list[ClusterField] = field(default_factory=list)

    def add_field(self, fieldname: str, weight: float, filter_value: str | None = None):
        if weight != 0.0:
            self.fields.append(ClusterField(fieldname, weight, filter_value))
        return self

    @property
    def num_filters(self) -> int:
        return sum(1 for f in self.fields if f.filter_value is not None)

    @classmethod
    def from_dict(cls, d: dict) -> "ClusterStrategy":
        """ClusterStrategy.parseFromJsonObject."""
        s = cls(
            clustering_eps=float(d.get("clusteringEps", 0.0)),
            clustering_min_points=int(d.get("clusteringMinPoints", 0)),
        )
        for fd in (d.get("fields") or {}).values():
            s.add_field(fd["fieldname"], float(fd["weight"]), fd.get("filterValue"))
        return s


@dataclass
class ClusterConfig:
    """ClusterConfig.java: clusterMoreRecords overfetch + strategy list."""

    cluster_more_records: int = 0
    strategies: list[ClusterStrategy] = field(default_factory=list)

    def add_strategy(self, strategy: ClusterStrategy) -> "ClusterConfig":
        self.strategies.append(strategy)
        return self

    @classmethod
    def from_dict(cls, d: dict) -> "ClusterConfig | None":
        """ClusterConfig.parseFromJsonObject: None when neither key present."""
        out = cls()
        found = False
        if "clusterMoreRecords" in d:
            out.cluster_more_records = int(d["clusterMoreRecords"])
            found = True
        if "strategies" in d:
            out.strategies = [ClusterStrategy.from_dict(s) for s in d["strategies"]]
            found = True
        return out if found else None


def interpolate_epsilon(
    total_hits: int, slice_size: int, clustering_eps: float, cluster_more_records: int
) -> float:
    """InterpolateEpsilon.java:31-34, exactly:
    ``eps·(totalHits−sliceSize)/clusterMoreRecords`` clamped to [0, eps]."""
    if cluster_more_records == 0:
        return clustering_eps  # guard; the reference never passes 0 here
    eps = clustering_eps * (total_hits - slice_size) / cluster_more_records
    return max(min(eps, clustering_eps), 0.0)


def dbscan_commons_math(
    points: list[dict[int, float]], eps: float, min_points: int
) -> list[list[int]]:
    """DBSCAN with commons-math3 ``DBSCANClusterer.cluster`` semantics (the
    library the reference uses): neighbor sets EXCLUDE the point itself, a
    point is core when ``len(neighbors) >= minPts``, border/noise points are
    absorbed by the first cluster that reaches them, and seed expansion
    appends unseen neighbors in encounter order.  Returns clusters as lists
    of point indices in absorption order."""
    n = len(points)
    dist = distance_matrix_sparse(points)
    NOISE, IN_CLUSTER = 1, 2
    status = [0] * n  # 0 = unvisited
    clusters: list[list[int]] = []
    neighbors_of = [
        [j for j in range(n) if j != i and dist[i, j] <= eps] for i in range(n)
    ]
    for i in range(n):
        if status[i] != 0:
            continue
        neigh = neighbors_of[i]
        if len(neigh) >= min_points:
            cluster = [i]
            status[i] = IN_CLUSTER
            seeds = list(neigh)
            seen = set(seeds)
            k = 0
            while k < len(seeds):
                cur = seeds[k]
                st = status[cur]
                if st == 0:  # unvisited: may expand
                    cur_neigh = neighbors_of[cur]
                    if len(cur_neigh) >= min_points:
                        for j in cur_neigh:
                            if j not in seen:
                                seen.add(j)
                                seeds.append(j)
                if st != IN_CLUSTER:
                    status[cur] = IN_CLUSTER
                    cluster.append(cur)
                k += 1
            clusters.append(cluster)
        else:
            status[i] = NOISE
    return clusters


def distance_matrix_sparse(points: list[dict[int, float]]) -> np.ndarray:
    """GeneralizedJaccard distance matrix over sparse ord→weight vectors —
    identical to GeneralizedJaccardDistance.compute over the dense
    ``getPoint()`` arrays (all entries ≥ 0, absent ords contribute only to
    Σmax)."""
    n = len(points)
    if n == 0:
        return np.zeros((0, 0))
    max_ord = max((max(p) for p in points if p), default=-1) + 1
    dense = np.zeros((n, max_ord))
    for i, p in enumerate(points):
        for o, w in p.items():
            dense[i, o] = w
    smin = np.minimum(dense[:, None, :], dense[None, :, :]).sum(axis=2)
    smax = np.maximum(dense[:, None, :], dense[None, :, :]).sum(axis=2)
    with np.errstate(invalid="ignore", divide="ignore"):
        d = 1.0 - smin / smax
    return np.nan_to_num(d, nan=1.0)


@dataclass
class DocScore:
    """MerescoCluster.DocScore (docId + PageRank score)."""

    doc_id: int
    score: float


@dataclass
class TermScore:
    """MerescoCluster.TermScore."""

    term: str
    score: float


@dataclass
class MerescoCluster:
    top_docs: list[DocScore]
    top_terms: list[TermScore]


class _FilterConditionFailed(Exception):
    pass


class _StrategyClusterer:
    """MerescoClusterer.StrategyClusterer (:160-237)."""

    def __init__(self, strategy: ClusterStrategy, eps: float, ords: dict[str, int]):
        self.eps = eps
        self.min_points = strategy.clustering_min_points
        self.fields = list(strategy.fields)
        self.num_filters = strategy.num_filters
        self._ords = ords
        self.docvectors: list[tuple[int, dict[int, float]]] = []  # (doc_id, vec)

    def _ord(self, term: str) -> int:
        o = self._ords.get(term)
        if o is None:
            o = len(self._ords)
            self._ords[term] = o
        return o

    def _term_vector(self, field_terms: dict[str, Counter], f: ClusterField):
        """termVector (:218-236): ord→tf vector for one field; raises when a
        filter value is set but absent from the doc's terms."""
        terms = field_terms.get(f.fieldname)
        matched = f.filter_value is None
        vector = None
        if terms is not None:
            vector = {}
            # Lucene TermsEnum iterates terms in sorted order — ord
            # registration order matters for term tie-breaks in PageRank
            for term in sorted(terms):
                if term == f.filter_value:
                    matched = True
                vector[self._ord(term)] = float(terms[term])
        if not matched:
            raise _FilterConditionFailed()
        return vector

    def collect_if_matches(self, doc_id: int, field_terms: dict[str, Counter]) -> bool:
        """createVector (:196-216): Σ weightᵢ·vectorᵢ over the strategy's
        fields (combineToSelf algebra); None when no field had terms."""
        vector: dict[int, float] | None = None
        try:
            for f in self.fields:
                v = self._term_vector(field_terms, f)
                if v is None:
                    continue
                if vector is None:
                    vector = {o: w * f.weight for o, w in v.items()}
                else:
                    for o, w in v.items():
                        vector[o] = vector.get(o, 0.0) + w * f.weight
        except _FilterConditionFailed:
            return False
        if vector is None:
            return False
        self.docvectors.append((doc_id, vector))
        return True


def _pagerank_bipartite(
    vectors: list[tuple[int, dict[int, float]]],
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> tuple[list[tuple[int, float]], list[tuple[int, float]]]:
    """PageRank.java:32-161 over the doc↔term bipartite graph: one edge per
    (doc, term ord) with weight tf; both endpoints count the edge in their
    degree; PR₁ += PR₀(other)/edges(other)·weight, commit
    PR₀ = (1−d) + d·PR₁.  Returns (docs as (doc_id, PR) in insertion order
    sorted stable-desc, terms as (ord, PR) in ord order sorted stable-desc).
    """
    doc_ids = [d for d, _ in vectors]
    # zero-weight entries create no edge and no term node (PageRank.add
    # skips docvector[ord] > 0.0 only)
    ords_used = sorted({o for _, v in vectors for o, w in v.items() if w > 0.0})
    tpos = {o: i for i, o in enumerate(ords_used)}
    nd, nt = len(doc_ids), len(ords_used)
    # edge arrays — doc-major, ord order within doc: the SAME accumulation
    # order as the reference's global edge list, so the float sums are
    # bit-identical (pinned by tests/test_pagerank.py)
    e_doc = np.array(
        [i for i, (_, v) in enumerate(vectors) for _, w in sorted(v.items()) if w > 0.0],
        dtype=np.int64,
    )
    e_term = np.array(
        [tpos[o] for _, v in vectors for o, w in sorted(v.items()) if w > 0.0],
        dtype=np.int64,
    )
    e_w = np.array(
        [w for _, v in vectors for _, w in sorted(v.items()) if w > 0.0],
        dtype=np.float64,
    )
    deg_d = np.bincount(e_doc, minlength=nd).astype(np.float64)
    deg_t = np.bincount(e_term, minlength=nt).astype(np.float64)
    node_count = nd + nt
    pr_d = np.full(nd, 1.0 / node_count)
    pr_t = np.full(nt, 1.0 / node_count)
    for _ in range(iterations):
        contrib_from_t = pr_t[e_term] / deg_t[e_term] * e_w
        contrib_from_d = pr_d[e_doc] / deg_d[e_doc] * e_w
        new_d = np.bincount(e_doc, weights=contrib_from_t, minlength=nd)
        new_t = np.bincount(e_term, weights=contrib_from_d, minlength=nt)
        pr_d = (1.0 - damping) + damping * new_d
        pr_t = (1.0 - damping) + damping * new_t
    # stable desc sorts (Collections.sort with Double.compare(rhs, lhs))
    d_order = np.argsort(-pr_d, kind="stable")
    t_order = np.argsort(-pr_t, kind="stable")
    docs = [(doc_ids[int(i)], float(pr_d[int(i)])) for i in d_order]
    terms = [(ords_used[int(i)], float(pr_t[int(i)])) for i in t_order]
    return docs, terms


class MerescoClusterer:
    """MerescoClusterer.java:52-158 — multi-strategy, most-filters-first.

    Drive it like the reference: ``collect(doc_id, field_terms)`` per top
    doc (``field_terms``: {fieldname: Counter(term→tf)}), then ``finish()``,
    then ``cluster(doc_id)``."""

    def __init__(
        self,
        config: ClusterConfig,
        total_hits: int | None = None,
        slice_size: int = 0,
        interpolate: bool = False,
    ):
        self._ords: dict[str, int] = {}
        self.strategy_clusterers: list[_StrategyClusterer] = []
        for s in config.strategies:
            eps = s.clustering_eps
            if interpolate and total_hits is not None:
                eps = interpolate_epsilon(
                    total_hits, slice_size, s.clustering_eps, config.cluster_more_records
                )
            self.strategy_clusterers.append(_StrategyClusterer(s, eps, self._ords))
        # most filters first (MerescoClusterer.java:75-81); python sort is
        # stable like Collections.sort, preserving config order on ties
        self.strategy_clusterers.sort(key=lambda sc: -sc.num_filters)
        self.clusters: list[list[tuple[int, dict[int, float]]]] = []

    def collect(self, doc_id: int, field_terms: dict[str, Counter]) -> None:
        for sc in self.strategy_clusterers:
            if sc.collect_if_matches(doc_id, field_terms):
                break

    def finish(self) -> None:
        self.clusters = []
        for sc in self.strategy_clusterers:
            for idxs in dbscan_commons_math(
                [v for _, v in sc.docvectors], sc.eps, sc.min_points
            ):
                self.clusters.append([sc.docvectors[i] for i in idxs])

    def cluster(self, doc_id: int) -> MerescoCluster | None:
        """rankCluster (:133-158) for the cluster containing ``doc_id``."""
        by_ord = {o: t for t, o in self._ords.items()}
        for members in self.clusters:
            if any(d == doc_id for d, _ in members):
                docs, terms = _pagerank_bipartite(members)
                return MerescoCluster(
                    top_docs=[DocScore(d, s) for d, s in docs],
                    top_terms=[TermScore(by_ord[o], s) for o, s in terms],
                )
        return None


@dataclass
class ClusterHit:
    """LuceneResponse.ClusterHit (Lucene.java:402-410): the representative's
    identifier + the triggering hit's score, with the cluster's ranked
    duplicates and terms attached (empty for unclustered hits)."""

    id: str
    score: float
    top_docs: list[DocScore] = field(default_factory=list)
    top_terms: list[TermScore] = field(default_factory=list)
