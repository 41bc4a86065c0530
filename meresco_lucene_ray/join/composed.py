"""Composed (multi-core) queries: key-bitset semi-joins across indexes.

Re-expresses ``MultiLucene.executeComposedQuery``
(/root/reference/src/org/meresco/lucene/MultiLucene.java:64-193) as an
explicit DAG over per-core ``IndexSearcher``s:

  stage 1  fan-out: collect key bitsets per other core (its query AND its
           filter queries — MultiLucene.java:195-233), plus unite bitsets
           (J4, :207-217) and exclude bitsets (J8, :235-252); rank queries
           produce per-key max-score arrays (J5) quantized to 16 bits (our
           float16 stands in for the reference's float1120 encoding,
           Utils.java:138-159 — same width, not bit-identical).
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

from ..query.ast import BoolQ, KeyFilterQ, MatchAllQ
from ..query.engine import IndexSearcher, SearchResult
from .bitsets import KeyBits


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
    facets: dict[str, list[str]] = field(default_factory=dict)
    sort_by_other: tuple[str, str, bool] | None = None  # (other_core, col, desc)
    relational_filter: Any = None  # J7 expression; OVERRIDES filter_queries keys
    start: int = 0
    stop: int = 10
    export_keys: bool = False

    def key_col(self, core_x: str, core_y: str) -> str:
        for (a, b), (ka, kb) in self.matches.items():
            if (a, b) == (core_x, core_y):
                return ka
            if (b, a) == (core_x, core_y):
                return kb
        raise KeyError(f"no match registered between {core_x} and {core_y}")


class MultiSearcher:
    """MultiLucene analog: {coreName → IndexSearcher} + one numerated key space."""

    def __init__(self, cores: dict[str, IndexSearcher], key_space: int):
        self.cores = cores
        self.key_space = key_space

    def execute(self, cq: ComposedQuery) -> SearchResult:
        result_core = cq.result_core
        searcher = self.cores[result_core]
        others = [c for c in self.cores if c != result_core]

        active_others = [
            c
            for c in others
            if c in cq.queries or cq.filter_queries.get(c) or c in cq.rank_queries
            or cq.exclude_filter_queries.get(c) or cq.facets.get(c)
        ]
        if not active_others and not cq.unites and cq.relational_filter is None:
            # single-core shortcut (MultiLucene.java:68-73)
            return searcher.execute(
                cq.queries.get(result_core, MatchAllQ()),
                start=cq.start,
                stop=cq.stop,
                facets=cq.facets.get(result_core, ()),
            )

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
            # 16-bit score quantization (float1120 stand-in, Utils.java:138-159)
            rank_items.append((_rkey(core), arr.astype(np.float16).astype(np.float64)))

        # ---- stage 2: result-core query with broadcast masks
        base_q = cq.queries.get(result_core, MatchAllQ())
        final_q = (
            base_q
            if not filters and not must_not
            else BoolQ(must=(base_q,), filter=tuple(filters), must_not=tuple(must_not))
        )

        rank_adjust = {"ratio": cq.rank_ratio, "items": rank_items} if rank_items else None
        join_cols = None
        sort = None
        if cq.sort_by_other:
            other_core, col, desc = cq.sort_by_other
            vals = self.cores[other_core].key_value_array(
                cq.key_col(other_core, result_core), col, self.key_space
            )
            join_cols = {f"join_{col}": (_rkey(other_core), vals, _missing_of(vals))}
            sort = [(f"join_{col}", desc, None)]

        res = searcher.execute(
            final_q,
            start=cq.start,
            stop=cq.stop,
            facets=cq.facets.get(result_core, ()),
            rank_adjust=rank_adjust,
            join_cols=join_cols,
            sort=sort,
        )

        # ---- stage 3: other-core facets filtered by result keys
        for core in others:
            cols = cq.facets.get(core)
            if not cols:
                continue
            result_keys = KeyBits(
                searcher.collect_keys(final_q, _rkey(core), self.key_space)
            )
            other_q = KeyFilterQ(cq.key_col(core, result_core), result_keys.materialize())
            other_res = self.cores[core].execute(other_q, stop=0, facets=cols)
            res.drilldown_data.update(
                {f"{core}.{k}": v for k, v in other_res.drilldown_data.items()}
            )

        if cq.export_keys:
            res.drilldown_data["__exported_keys__"] = KeyBits(
                searcher.collect_keys(final_q, _any_rkey(), self.key_space)
            )
        return res


def _missing_of(vals: np.ndarray):
    if np.issubdtype(np.asarray(vals).dtype, np.number):
        return np.iinfo(np.int64).max if np.issubdtype(vals.dtype, np.integer) else np.inf
    return ""
