"""Composed (multi-core) queries: key-bitset semi-joins across indexes.

Re-expresses ``MultiLucene.executeComposedQuery``
(/root/reference/src/org/meresco/lucene/MultiLucene.java:64-193) as an
explicit DAG over per-core ``IndexSearcher``s:

  stage 1  fan-out: collect key bitsets per other core (its query AND its
           filter queries — MultiLucene.java:195-233), plus unite bitsets
           (J4, :207-217) and exclude bitsets (J8, :235-252); rank queries
           produce per-key max-score arrays (J5) quantized to 16 bits by the
           exact float1120 encoding (Utils.java:138-159 — bit-identical
           round-trip, see join/smallfloat.py).
  stage 2  result-core query with the broadcast bitsets applied as
           non-scoring KeyFilter clauses and the rank arrays blended into
           scores: (1−r)·own + r·∏(1+other(key)).
  stage 3  other-core facets filtered by the RESULT core's collected keys
           (MultiLucene.java:157-176).

All cross-core traffic is bitsets / small arrays through the object store —
never document rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..query.ast import BoolQ, KeyFilterQ, MatchAllQ, PathPrefixQ, RelationalQ
from ..query.engine import IndexSearcher, SearchResult
from .bitsets import KeyBits
from .smallfloat import quantize_scores_1120


@dataclass
class ComposedQuery:
    """ComposedQuery analog (meresco/lucene/composedquery.py:58-299)."""

    result_core: str
    queries: dict[str, Any] = field(default_factory=dict)  # core -> query AST
    filter_queries: dict[str, list] = field(default_factory=dict)
    exclude_filter_queries: dict[str, list] = field(default_factory=dict)
    # (coreA, coreB) -> (keyColA, keyColB); key values live in one numerated space
    matches: dict[tuple[str, str], tuple[str, str]] = field(default_factory=dict)
    unites: list[tuple[tuple[str, Any], tuple[str, Any]]] = field(default_factory=list)
    rank_queries: dict[str, Any] = field(default_factory=dict)
    rank_ratio: float = 0.5
    # facet entries: str | (col, mode) | {"fieldname", "path", "max_terms"}
    facets: dict[str, list] = field(default_factory=dict)
    sort_by_other: tuple[str, str, bool] | None = None  # legacy single-key form
    # (core, field, desc) — same-core fields sort directly, other-core fields
    # sort through the broadcast key→value array (J6)
    sort_keys: list[tuple[str, str, bool]] = field(default_factory=list)
    # core -> [(facet field, path list)] ANDed as PathPrefixQ filters (Q10)
    drilldown_queries: dict[str, list[tuple[str, list[str]]]] = field(default_factory=dict)
    dedup_field: str | None = None
    dedup_sort_field: str | None = None
    clustering: bool = False
    # ClusterConfig override; None falls back to the MultiSearcher's default
    # (the reference's LuceneSettings.clusterConfig, Lucene.java:257-266)
    cluster_config: Any = None
    relational_filter: Any = None  # J7 expression; OVERRIDES filter_queries keys
    start: int = 0
    stop: int = 10
    export_keys: bool = False
    # {suggests: [word...], count: int, field: str, mode: str} — passed
    # through to the result core's executeQuery and answered from ITS term
    # dictionary (composedquery.py:65, Lucene.java:334-342)
    suggestion_request: dict | None = None

    def key_col(self, core_x: str, core_y: str) -> str:
        for (a, b), (ka, kb) in self.matches.items():
            if (a, b) == (core_x, core_y):
                return ka
            if (b, a) == (core_x, core_y):
                return kb
        raise KeyError(f"no match registered between {core_x} and {core_y}")


class MultiSearcher:
    """MultiLucene analog: {coreName → IndexSearcher} + one numerated key space."""

    def __init__(
        self, cores: dict[str, IndexSearcher], key_space: int, cluster_config=None
    ):
        self.cores = cores
        self.key_space = key_space
        # default ClusterConfig (LuceneSettings.clusterConfig analog)
        self.cluster_config = cluster_config

    def resolve_relational(self, q):
        """Replace every embedded RelationalQ node (cross-core clause from the
        CQL front end) with a KeyFilterQ over the other core's collected key
        bitset — the WrappedRelationalQuery evaluation step, done BEFORE the
        fan-out so the node composes inside any boolean nesting."""
        if isinstance(q, RelationalQ):
            bits = KeyBits(
                self.cores[q.core].collect_keys(q.query, q.collect_key_col, self.key_space)
            )
            return KeyFilterQ(q.filter_key_col, bits.materialize())
        if isinstance(q, BoolQ):
            return BoolQ(
                must=tuple(self.resolve_relational(s) for s in q.must),
                should=tuple(self.resolve_relational(s) for s in q.should),
                must_not=tuple(self.resolve_relational(s) for s in q.must_not),
                filter=tuple(self.resolve_relational(s) for s in q.filter),
                boost=q.boost,
            )
        return q

    def _clustering_active(self, cq: ComposedQuery, searcher) -> bool:
        """True when clustering will actually run: flag on, a config (query
        or MultiSearcher default — LuceneSettings.clusterConfig), and a
        term-vector source.  Clustering WINS over dedup/grouping
        (Lucene.java executeQuery routes to clusterTopDocsResponse INSTEAD
        of the dedup collector — testClusteringWinsOverGroupingAndDedup)."""
        return (
            cq.clustering
            and (cq.cluster_config or self.cluster_config) is not None
            and (searcher.termvectors_fn is not None or searcher.has_stored_termvectors())
        )

    def _maybe_cluster(self, cq: ComposedQuery, searcher, final_q, res) -> None:
        """Attach ClusterHits when ``cq.clustering`` is on
        (clusterTopDocsResponse, Lucene.java:365-414).  With no config or
        no term-vector source, the flag is a no-op — exactly the
        reference's null-clusterConfig behavior (Lucene.java:257-266)."""
        if not self._clustering_active(cq, searcher):
            return
        config = cq.cluster_config or self.cluster_config
        _total, hits = searcher.cluster_top_docs(
            final_q,
            config,
            searcher.termvectors_fn,
            start=cq.start,
            stop=cq.stop,
        )
        res.cluster_hits = hits

    def execute(self, cq: ComposedQuery) -> SearchResult:
        result_core = cq.result_core
        searcher = self.cores[result_core]
        others = [c for c in self.cores if c != result_core]

        # front-door extras: sort keys (legacy sort_by_other folded in) and
        # drilldown queries (PathPrefixQ filters per core — Q10)
        sort_keys = list(cq.sort_keys)
        if cq.sort_by_other:
            sort_keys.append(tuple(cq.sort_by_other))
        dd_filters: dict[str, list] = {
            core: [PathPrefixQ(f, tuple(p)) for f, p in entries]
            for core, entries in cq.drilldown_queries.items()
        }

        active_others = [
            c
            for c in others
            if c in cq.queries or cq.filter_queries.get(c) or c in cq.rank_queries
            or cq.exclude_filter_queries.get(c) or cq.facets.get(c) or dd_filters.get(c)
            or any(sc == c for sc, _, _ in sort_keys)
        ]
        if not active_others and not cq.unites and cq.relational_filter is None:
            # single-core shortcut (MultiLucene.java:68-73); embedded
            # RelationalQ nodes still resolve against their cores
            base_q = self.resolve_relational(cq.queries.get(result_core, MatchAllQ()))
            own_filters = [
                self.resolve_relational(f) for f in cq.filter_queries.get(result_core, ())
            ] + dd_filters.get(result_core, [])
            if own_filters:
                base_q = BoolQ(must=(base_q,), filter=tuple(own_filters))
            res = searcher.execute(
                base_q,
                start=cq.start,
                stop=cq.stop,
                facets=_facet_specs(cq.facets.get(result_core, ())),
                sort=[(f, d, None) for _, f, d in sort_keys] or None,
                dedup_field=None if self._clustering_active(cq, searcher) else cq.dedup_field,
                dedup_sort_field=cq.dedup_sort_field,
                suggestion_request=cq.suggestion_request,
            )
            _shape_facets(res, result_core, result_core, cq.facets.get(result_core, ()))
            self._maybe_cluster(cq, searcher, base_q, res)
            return res

        # Each other core's bitset is applied through the RESULT-side key
        # column of ITS OWN match (cq.key_col(result_core, core)) — cores may
        # use different result-side key columns, so bitsets are never
        # pre-ANDed across cores.
        def _rkey(core: str) -> str:
            try:
                return cq.key_col(result_core, core)
            except KeyError:
                raise KeyError(
                    f"no match registered between result core {result_core!r} and "
                    f"{core!r}; ComposedQuery.matches must cover every core that "
                    "contributes filters/excludes/ranks/facets"
                )

        def _any_rkey() -> str:
            for core in others:
                try:
                    return cq.key_col(result_core, core)
                except KeyError:
                    continue
            raise ValueError(
                f"cannot resolve a key column on result core {result_core!r}: "
                "register a match involving the result core"
            )

        # ---- stage 1: collect filter bitsets from other cores
        filters: list[KeyFilterQ] = []
        if cq.relational_filter is not None:
            # relationalFilter override (MultiLucene.java:100-116)
            from .relational import RelationalRunner

            rel_bits = RelationalRunner(self.cores, self.key_space).execute(
                cq.relational_filter
            )
            filters.append(KeyFilterQ(_any_rkey(), rel_bits.materialize()))
        for core in (() if cq.relational_filter is not None else others):
            clauses = []
            if core in cq.queries:
                clauses.append(cq.queries[core])
            clauses.extend(cq.filter_queries.get(core, ()))
            clauses.extend(dd_filters.get(core, ()))
            if not clauses:
                continue
            q = clauses[0] if len(clauses) == 1 else BoolQ(must=tuple(clauses))
            bits = KeyBits(
                self.cores[core].collect_keys(q, cq.key_col(core, result_core), self.key_space)
            )
            filters.append(KeyFilterQ(_rkey(core), bits.materialize()))

        for (core_u1, q1), (core_u2, q2) in cq.unites:
            def _unite_key_col(core: str, partner: str) -> str:
                # a unite side may BE the result core: its keys are collected
                # through the match it shares with the partner core
                other = partner if core == result_core else result_core
                return cq.key_col(core, other)

            b1 = KeyBits(
                self.cores[core_u1].collect_keys(
                    q1, _unite_key_col(core_u1, core_u2), self.key_space
                )
            )
            b2 = KeyBits(
                self.cores[core_u2].collect_keys(
                    q2, _unite_key_col(core_u2, core_u1), self.key_space
                )
            )
            united = b1 | b2  # J4: max one unite, OR of the two (MultiLucene.java:207-217)
            unite_other = core_u2 if core_u1 == result_core else core_u1
            filters.append(KeyFilterQ(_rkey(unite_other), united.materialize()))

        must_not: list[KeyFilterQ] = []
        for core in others:
            ex: KeyBits | None = None
            for q in cq.exclude_filter_queries.get(core, ()):
                bits = KeyBits(
                    self.cores[core].collect_keys(q, cq.key_col(core, result_core), self.key_space)
                )
                ex = bits if ex is None else (ex | bits)
            if ex is not None:
                must_not.append(KeyFilterQ(_rkey(core), ex.materialize()))

        rank_items = []
        for core, rq in cq.rank_queries.items():
            if core == result_core:
                continue
            arr = self.cores[core].key_max_scores(rq, cq.key_col(core, result_core), self.key_space)
            # exact 16-bit float1120 quantization (Utils.java:138-159)
            rank_items.append((_rkey(core), quantize_scores_1120(arr)))

        # ---- stage 2: result-core query with broadcast masks
        base_q = self.resolve_relational(cq.queries.get(result_core, MatchAllQ()))
        own_filters = [
            self.resolve_relational(f) for f in cq.filter_queries.get(result_core, ())
        ] + dd_filters.get(result_core, [])
        all_filters = own_filters + filters
        final_q = (
            base_q
            if not all_filters and not must_not
            else BoolQ(must=(base_q,), filter=tuple(all_filters), must_not=tuple(must_not))
        )

        rank_adjust = {"ratio": cq.rank_ratio, "items": rank_items} if rank_items else None
        join_cols = {}
        sort = []
        for s_core, col, desc in sort_keys:
            if s_core == result_core or col == "score":
                sort.append((col, desc, None))
            else:
                # other-core sort field: broadcast its key→value array (J6)
                vals = self.cores[s_core].key_value_array(
                    cq.key_col(s_core, result_core), col, self.key_space
                )
                name = f"join_{col}"
                join_cols[name] = (_rkey(s_core), vals, _missing_of(vals))
                sort.append((name, desc, None))

        res = searcher.execute(
            final_q,
            start=cq.start,
            stop=cq.stop,
            facets=_facet_specs(cq.facets.get(result_core, ())),
            rank_adjust=rank_adjust,
            join_cols=join_cols or None,
            sort=sort or None,
            dedup_field=None if self._clustering_active(cq, searcher) else cq.dedup_field,
            dedup_sort_field=cq.dedup_sort_field,
            suggestion_request=cq.suggestion_request,
        )
        _shape_facets(res, result_core, result_core, cq.facets.get(result_core, ()))

        # ---- stage 3: other-core facets filtered by result keys
        for core in others:
            cols = cq.facets.get(core)
            if not cols:
                continue
            result_keys = KeyBits(
                searcher.collect_keys(final_q, _rkey(core), self.key_space)
            )
            other_q = KeyFilterQ(cq.key_col(core, result_core), result_keys.materialize())
            other_res = self.cores[core].execute(other_q, stop=0, facets=_facet_specs(cols))
            _shape_facets(other_res, core, core, cols)
            res.drilldown_data.update(
                {f"{core}.{k}": v for k, v in other_res.drilldown_data.items()}
            )

        if cq.export_keys:
            res.drilldown_data["__exported_keys__"] = KeyBits(
                searcher.collect_keys(final_q, _any_rkey(), self.key_space)
            )
        self._maybe_cluster(cq, searcher, final_q, res)
        return res


def _missing_of(vals: np.ndarray):
    if np.issubdtype(np.asarray(vals).dtype, np.number):
        return np.iinfo(np.int64).max if np.issubdtype(vals.dtype, np.integer) else np.inf
    return ""


def _facet_specs(entries) -> list:
    """Normalize facet entries (str | (col, mode) | front-door dict) to the
    engine's (col, mode) form."""
    out = []
    for e in entries or ():
        out.append((e["fieldname"], "auto") if isinstance(e, dict) else e)
    return out


def _shape_facets(res, core: str, _res_core: str, entries) -> None:
    """Apply front-door facet dicts' path restriction (children of the given
    taxonomy path) and maxTerms trim to the raw hierarchical count maps."""
    for e in entries or ():
        if not isinstance(e, dict):
            continue
        col = e["fieldname"]
        data = res.drilldown_data.get(col)
        if data is None:
            continue
        path = e.get("path") or []
        if path:
            prefix = ">".join(path) + ">"
            data = {
                k[len(prefix):]: v
                for k, v in data.items()
                if isinstance(k, str)
                and k.startswith(prefix)
                and ">" not in k[len(prefix):]
            }
        mt = e.get("max_terms")
        if mt:
            data = dict(list(data.items())[:mt])
        res.drilldown_data[col] = data
