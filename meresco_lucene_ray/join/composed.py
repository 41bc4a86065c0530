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


class Unite:
    """Unite analog (composedquery.py:270-299): a single multi-core OR whose
    two (core, query) legs each collect keys into the RESULT core's key
    space.  Iterating yields the two ``(core, query)`` pairs so the engine's
    ``for (c1, q1), (c2, q2) in cq.unites`` unpacking accepts both this and
    the plain tuple-pair form."""

    def __init__(self, parent, core_a_spec: dict, core_b_spec: dict):
        self._parent = parent
        self.core_a_spec = dict(core_a_spec)
        self.core_b_spec = dict(core_b_spec)

    def __iter__(self):
        yield (self.core_a_spec["core"], self.core_a_spec["query"])
        yield (self.core_b_spec["core"], self.core_b_spec["query"])

    def queries(self):
        """Yield ``({core, query, keyName}, resultKeyName)`` per leg
        (composedquery.py:276-281)."""
        core_a, core_b = self.core_a_spec["core"], self.core_b_spec["core"]
        key_a = self._parent.key_name(core_a, core_b)
        key_b = self._parent.key_name(core_b, core_a)
        result_key = key_a if self._parent.result_core == core_a else key_b
        yield dict(core=core_a, query=self.core_a_spec["query"], keyName=key_a), result_key
        yield dict(core=core_b, query=self.core_b_spec["query"], keyName=key_b), result_key

    def convert_query(self, convert):
        for spec in (self.core_a_spec, self.core_b_spec):
            spec["query"] = convert(spec["core"], spec["query"])

    def as_dict(self):
        return {
            "A": [self.core_a_spec["core"], self.core_a_spec["query"]],
            "B": [self.core_b_spec["core"], self.core_b_spec["query"]],
        }

    @classmethod
    def from_dict(cls, parent, d):
        return cls(
            parent,
            dict(core=d["A"][0], query=d["A"][1]),
            dict(core=d["B"][0], query=d["B"][1]),
        )


@dataclass
class ComposedQuery:
    """ComposedQuery analog (meresco/lucene/composedquery.py:58-299).

    Construct either directly (dataclass fields, the engine-native form) or
    through the reference-shaped builder API (``set_core_query`` /
    ``add_match`` / ``add_unite`` / ``validate`` / ``as_dict`` — snake_case
    ports of setCoreQuery/addMatch/addUnite/validate/asDict)."""

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
    # explicit key column for exportKeys (the ExportKeysHandler's `exportKey`
    # URL parameter); None derives it from the registered matches
    export_key_name: str | None = None
    # {suggests: [word...], count: int, field: str, mode: str} — passed
    # through to the result core's executeQuery and answered from ITS term
    # dictionary (composedquery.py:65, Lucene.java:334-342)
    suggestion_request: dict | None = None
    # extra per-core queries ANDed into other-core facet counting
    # (addOtherCoreFacetFilter, composedquery.py:110-113)
    other_core_facet_filters: dict[str, list] = field(default_factory=dict)
    # full match specs as given to add_match (uniqueKey vs key retained for
    # the wire round-trip); `matches` above stays the engine-consumed form
    match_specs: dict = field(default_factory=dict)
    # [(field, boost), ...] forwarded to the result core's converter
    unqualified_term_fields: list = field(default_factory=list)
    # JSON string form of the relational filter (relationalFilterJson)
    relational_filter_json: str | None = None
    # cores registered via the builder API (setCoreQuery et al. track a
    # cores set; direct-field construction derives cores from field keys)
    explicit_cores: set = field(default_factory=set)
    # constructor convenience mirroring ComposedQuery(resultsFrom, query=..)
    query: Any = None

    def __post_init__(self):
        if self.query is not None:
            self.set_core_query(self.result_core, self.query)

    def key_col(self, core_x: str, core_y: str) -> str:
        for (a, b), (ka, kb) in self.matches.items():
            if (a, b) == (core_x, core_y):
                return ka
            if (b, a) == (core_x, core_y):
                return kb
        raise KeyError(f"no match registered between {core_x} and {core_y}")

    # ---- reference-shaped builder API (composedquery.py:78-143) ---------
    @property
    def cores(self) -> set:
        used = set(self.explicit_cores)
        used.add(self.result_core)
        for d in (
            self.queries,
            self.filter_queries,
            self.exclude_filter_queries,
            self.facets,
            self.drilldown_queries,
            self.rank_queries,
            self.other_core_facet_filters,
        ):
            used.update(d.keys())
        for unite in self.unites:
            for core, _q in unite:
                used.add(core)
        for s_core, _col, _desc in self.sort_keys:
            used.add(s_core)
        return used

    def set_core_query(self, core, query, filter_queries=None, facets=None):
        """setCoreQuery (:78-87)."""
        self.explicit_cores.add(core)
        self.queries[core] = query
        for fq in filter_queries or ():
            self.add_filter_query(core, fq)
        for f in facets or ():
            self.add_facet(core, f)
        return self

    def add_filter_query(self, core, query):
        self.explicit_cores.add(core)
        self.filter_queries.setdefault(core, []).append(query)
        return self

    def add_exclude_filter_query(self, core, query):
        self.explicit_cores.add(core)
        self.exclude_filter_queries.setdefault(core, []).append(query)
        return self

    def add_facet(self, core, facet):
        self.explicit_cores.add(core)
        self.facets.setdefault(core, []).append(facet)
        return self

    def add_drilldown_query(self, core, drilldown_query):
        self.explicit_cores.add(core)
        self.drilldown_queries.setdefault(core, []).append(drilldown_query)
        return self

    def add_other_core_facet_filter(self, core, query):
        self.explicit_cores.add(core)
        self.other_core_facet_filters.setdefault(core, []).append(query)
        return self

    def set_rank_query(self, core, query):
        self.explicit_cores.add(core)
        self.rank_queries[core] = query
        return self

    def add_match(self, match_core_a_spec: dict, match_core_b_spec: dict):
        """addMatch (:121-133): specs are ``{core, uniqueKey|key}``; the
        result core's side MUST use uniqueKey."""
        pair = (match_core_a_spec["core"], match_core_b_spec["core"])
        self.match_specs[pair] = (dict(match_core_a_spec), dict(match_core_b_spec))
        self.matches[pair] = tuple(
            spec.get("uniqueKey", spec.get("key"))
            for spec in (match_core_a_spec, match_core_b_spec)
        )
        results_from_found = False
        for spec in (match_core_a_spec, match_core_b_spec):
            if spec["core"] == self.result_core:
                results_from_found = True
                if "uniqueKey" not in spec:
                    raise ValueError(
                        "Match for result core '%s' must have a uniqueKey "
                        "specification." % self.result_core
                    )
        if not results_from_found:
            raise ValueError(
                "Match that does not include resultsFromCore ('%s') not yet "
                "supported" % self.result_core
            )
        return self

    def add_unite(self, unite_core_a_spec: dict, unite_core_b_spec: dict):
        """addUnite (:135-142): at most one multi-core OR."""
        if len(self.unites) > 0:
            raise ValueError("No more than 1 addUnite supported")
        for spec in (unite_core_a_spec, unite_core_b_spec):
            self.explicit_cores.add(spec["core"])
        self.unites.append(Unite(self, unite_core_a_spec, unite_core_b_spec))
        return self

    def add_sort_key(self, sort_key: dict):
        """addSortKey (:144-147): ``{sortBy, sortDescending, core?}`` — the
        engine-native tuple form is appended."""
        core = sort_key.get("core", self.result_core)
        self.explicit_cores.add(core)
        self.sort_keys.append(
            (core, sort_key["sortBy"], bool(sort_key.get("sortDescending", False)))
        )
        return self

    # ---- accessors (:149-186) -------------------------------------------
    def query_for(self, core):
        return self.queries.get(core)

    def queries_for(self, core):
        return [q for q in [self.query_for(core)] + self.filter_queries_for(core) if q]

    def filter_queries_for(self, core):
        return self.filter_queries.get(core, [])

    def exclude_filter_queries_for(self, core):
        return self.exclude_filter_queries.get(core, [])

    def facets_for(self, core):
        return self.facets.get(core, [])

    def drilldown_queries_for(self, core):
        return self.drilldown_queries.get(core, [])

    def other_core_facet_filters_for(self, core):
        return self.other_core_facet_filters.get(core, [])

    def rank_query_for(self, core):
        return self.rank_queries.get(core)

    def key_name(self, core, other_core):
        """keyName (:170-181) — the key this core collects/filters on for
        the given other core; same-core falls back to the first match
        mentioning the core (the reference's filters/ranks TODO path)."""
        if core == other_core:
            for (a, b), (ka, kb) in self.matches.items():
                if a == core:
                    return ka
                if b == core:
                    return kb
            raise KeyError(f"no match mentions core {core!r}")
        return self.key_col(core, other_core)

    def key_names(self, core) -> set:
        return {
            self.key_name(core, other) for other in self.cores if other != core
        }

    @property
    def number_of_used_cores(self) -> int:
        return len(self.cores)

    def is_single_core_query(self) -> bool:
        return self.number_of_used_cores == 1

    def cores_in_matches(self) -> set:
        return {c for pair in self.matches for c in pair}

    def validate(self):
        """validate (:208-219): every used core must be matched to the
        result core; relational_filter_json must parse as JSON."""
        import json

        for core in self.cores:
            if core == self.result_core:
                continue
            try:
                self.key_col(self.result_core, core)
            except KeyError:
                raise ValueError(
                    "No match set for cores %s" % str((self.result_core, core))
                )
        if self.relational_filter_json:
            try:
                json.loads(self.relational_filter_json)
            except ValueError:
                raise ValueError(
                    "Value '%s' for 'relationalFilterJson' can not be parsed "
                    "as JSON." % self.relational_filter_json
                )

    def convert_with(self, **converts):
        """convertWith (:221-238): per-core query converters applied to all
        stored queries; the result core's converter receives
        ``composedQuery`` (and ``unqualifiedTermFields`` when set)."""

        def convert(core, query):
            if query is None:
                return None
            fn = converts[core]
            if core == self.result_core:
                kwargs = {"composedQuery": self}
                if self.unqualified_term_fields:
                    kwargs["unqualifiedTermFields"] = self.unqualified_term_fields
                return fn(query, **kwargs)
            return fn(query)

        self.queries = {c: convert(c, q) for c, q in self.queries.items()}
        self.filter_queries = {
            c: [convert(c, q) for q in qs] for c, qs in self.filter_queries.items()
        }
        self.exclude_filter_queries = {
            c: [convert(c, q) for q in qs]
            for c, qs in self.exclude_filter_queries.items()
        }
        self.rank_queries = {c: convert(c, q) for c, q in self.rank_queries.items()}
        self.other_core_facet_filters = {
            c: [convert(c, q) for q in qs]
            for c, qs in self.other_core_facet_filters.items()
        }
        for unite in self.unites:
            if isinstance(unite, Unite):
                unite.convert_query(convert)
        return self

    def _specs_of(self, pair) -> list:
        """Match specs for a core pair — stored form if add_match was used,
        else reconstructed (uniqueKey on the result core's side)."""
        if pair in self.match_specs:
            return list(self.match_specs[pair])
        keys = self.matches[pair]
        return [
            {
                "core": core,
                ("uniqueKey" if core == self.result_core else "key"): key,
            }
            for core, key in zip(pair, keys)
        ]

    # ---- wire round-trip (asDict/fromDict, :240-262) --------------------
    def as_dict(self) -> dict:
        """JSON-able container form.  Query values pass through VERBATIM
        (the reference ships its JSON query protocol inside; engine-AST
        values need ``query/serialize.query_to_dict`` applied by the
        transport layer)."""
        unites = [
            u.as_dict() if isinstance(u, Unite) else Unite(self, dict(core=u[0][0], query=u[0][1]), dict(core=u[1][0], query=u[1][1])).as_dict()
            for u in self.unites
        ]
        return {
            "resultsFrom": self.result_core,
            "cores": sorted(self.cores),
            "queries": dict(self.queries),
            "filterQueries": {c: list(v) for c, v in self.filter_queries.items()},
            "excludeFilterQueries": {
                c: list(v) for c, v in self.exclude_filter_queries.items()
            },
            "otherCoreFacetFilters": {
                c: list(v) for c, v in self.other_core_facet_filters.items()
            },
            "rankQueries": dict(self.rank_queries),
            "facets": {c: list(v) for c, v in self.facets.items()},
            "drilldownQueries": {
                c: [[f, list(p)] for f, p in v]
                for c, v in self.drilldown_queries.items()
            },
            "_matches": {
                "->".join(pair): self._specs_of(pair) for pair in self.matches
            },
            "_unites": unites,
            "sortKeys": [
                dict(core=c, sortBy=f, sortDescending=d) for c, f, d in self.sort_keys
            ],
            "start": self.start,
            "stop": self.stop,
            "rankQueryScoreRatio": self.rank_ratio,
            "dedupField": self.dedup_field,
            "dedupSortField": self.dedup_sort_field,
            "clustering": self.clustering,
            "clusteringConfig": self.cluster_config,
            "relationalFilterJson": self.relational_filter_json,
            "suggestionRequest": self.suggestion_request,
            "unqualifiedTermFields": list(self.unqualified_term_fields),
            "exportKeys": self.export_keys,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ComposedQuery":
        cq = cls(result_core=d["resultsFrom"])
        cq.explicit_cores = set(d.get("cores", ()))
        cq.queries = dict(d.get("queries", {}))
        cq.filter_queries = {c: list(v) for c, v in d.get("filterQueries", {}).items()}
        cq.exclude_filter_queries = {
            c: list(v) for c, v in d.get("excludeFilterQueries", {}).items()
        }
        cq.other_core_facet_filters = {
            c: list(v) for c, v in d.get("otherCoreFacetFilters", {}).items()
        }
        cq.rank_queries = dict(d.get("rankQueries", {}))
        cq.facets = {c: list(v) for c, v in d.get("facets", {}).items()}
        cq.drilldown_queries = {
            c: [(f, list(p)) for f, p in v]
            for c, v in d.get("drilldownQueries", {}).items()
        }
        for key, specs in d.get("_matches", {}).items():
            pair = tuple(key.split("->"))
            cq.match_specs[pair] = tuple(dict(s) for s in specs)
            cq.matches[pair] = tuple(
                s.get("uniqueKey", s.get("key")) for s in specs
            )
        cq.unites = [Unite.from_dict(cq, u) for u in d.get("_unites", [])]
        cq.sort_keys = [
            (s.get("core", cq.result_core), s["sortBy"], bool(s.get("sortDescending", False)))
            for s in d.get("sortKeys", [])
        ]
        cq.start = d.get("start") or 0
        if d.get("stop") is not None:
            cq.stop = d["stop"]
        if d.get("rankQueryScoreRatio") is not None:
            cq.rank_ratio = d["rankQueryScoreRatio"]
        cq.dedup_field = d.get("dedupField")
        cq.dedup_sort_field = d.get("dedupSortField")
        cq.clustering = bool(d.get("clustering", False))
        cq.cluster_config = d.get("clusteringConfig")
        cq.relational_filter_json = d.get("relationalFilterJson")
        cq.suggestion_request = d.get("suggestionRequest")
        cq.unqualified_term_fields = list(d.get("unqualifiedTermFields", []))
        cq.export_keys = bool(d.get("exportKeys", False))
        return cq


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

        if cq.relational_filter is None and cq.relational_filter_json:
            # relationalFilterJson wire form → relational AST
            # (ComposedQuery.relationalFilter parsing, MultiLucene.java:100-116).
            # Both dialects accepted: the reference's JsonQueryConverter names
            # (RelationalLuceneQuery/JoinAndQuery/...) and our native node names.
            import json as _json

            from ..query.serialize import query_from_dict
            from ..query.wireproto import _REL_TYPES, wire_to_relational

            d = _json.loads(cq.relational_filter_json)
            if d.get("type") in _REL_TYPES:
                from ..query.wireproto import WireConfig

                def _cfg_of(core):
                    mcfg = self.cores[core].manifest.config
                    return WireConfig(text_col=mcfg.get("text_col", "content"))

                cq.relational_filter = wire_to_relational(d, cfg_by_core=_cfg_of)
            else:
                cq.relational_filter = query_from_dict(d)

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
            if cq.queries.get(c) is not None or cq.filter_queries.get(c) or c in cq.rank_queries
            or cq.exclude_filter_queries.get(c) or cq.facets.get(c) or dd_filters.get(c)
            or any(sc == c for sc, _, _ in sort_keys)
        ]
        if not active_others and not cq.unites and cq.relational_filter is None:
            # single-core shortcut (MultiLucene.java:68-73); embedded
            # RelationalQ nodes still resolve against their cores
            base_q = self.resolve_relational(cq.queries.get(result_core) or MatchAllQ())
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
            if cq.export_keys:
                # ExportKeysHandler works on single-core composed queries too
                # (luceneservertest.testExportKeys); key name must be explicit
                # here — there is no match to derive it from
                res.drilldown_data["__exported_keys__"] = KeyBits(
                    searcher.collect_keys(base_q, cq.export_key_name, self.key_space)
                )
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
            if cq.queries.get(core) is not None:
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
        base_q = self.resolve_relational(cq.queries.get(result_core) or MatchAllQ())
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
            extra = cq.other_core_facet_filters.get(core)
            if extra:
                # addOtherCoreFacetFilter queries AND into the facet count
                # (MultiLucene.java:157-176)
                other_q = BoolQ(must=(other_q,), filter=tuple(extra))
            other_res = self.cores[core].execute(other_q, stop=0, facets=_facet_specs(cols))
            _shape_facets(other_res, core, core, cols)
            res.drilldown_data.update(
                {f"{core}.{k}": v for k, v in other_res.drilldown_data.items()}
            )

        if cq.export_keys:
            res.drilldown_data["__exported_keys__"] = KeyBits(
                searcher.collect_keys(
                    final_q, cq.export_key_name or _any_rkey(), self.key_space
                )
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
