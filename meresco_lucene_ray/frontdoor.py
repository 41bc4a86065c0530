"""Composed-query front door: SRU-style arguments + CQL strings → ComposedQuery.

Covers the two reference modules every deployment routes queries through:

- M9  ``ExtractFilterQueries`` — PORTED (near line-for-line, snake_cased)
  from /root/reference/meresco/lucene/extractfilterqueries.py:28-84: split a
  CQL AND-tree into the result-core query plus per-core filter expressions —
  a top-level AND operand whose fields all carry ONE other core's prefix
  becomes that core's filter (prefix stripped); mixed-core operands raise
  ``TooComplexQueryExpression``.  The control flow (and the "Multiple core
  query detected" message) is deliberately kept identical to the reference:
  this class IS the compatibility contract its tests pin, and any
  restructuring risks silent divergence on the 33 mirrored cases in
  tests/test_frontdoor.py.
- M10 ``ConvertToComposedQuery`` — re-expressed (materially restructured;
  the argument protocol is necessarily shared)
  (/root/reference/meresco/lucene/converttocomposedquery.py:44-160): the
  SRU-argument planner — x-filter / filterQueries / excludeFilterQueries /
  x-rank-query / x-filter-common-keys (dedup) / x-clustering / facets /
  drilldownQueries / sortKeys, with ``core.field`` prefix parsing
  (:149-160) — emitting a ready-to-execute ``ComposedQuery``.

Deviation (documented): a ``NOT core2.x=y`` filter operand — which the
reference carries as a must_not-flagged filter expression — maps onto the
engine's exclude-filter path (J8 bitset exclusion), the semantics MultiLucene
applies to it anyway.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable

from .cql import CqlConfig, QueryExpression, cql_to_expression, expression_to_query
from .join.composed import ComposedQuery

KEY_PREFIX = "__key__."  # fieldregistry.py:34


class TooComplexQueryExpression(Exception):
    pass


class ExtractFilterQueries:
    """M9: split a query expression into (result-core query, per-core filters)
    — extractfilterqueries.py:32-76 semantics on our expression tree."""

    def __init__(self, available_cores):
        self._available_cores = set(available_cores)

    def convert(self, expression: QueryExpression, core: str):
        filter_queries: dict[str, list[QueryExpression]] = {}
        if expression.operator is None or expression.operator == "OR":
            e = QueryExpression.nested("AND")
            e.operands.append(expression)
            expression = e
        if expression.operator == "AND":
            old_operands = expression.operands
            expression = QueryExpression.nested("AND")
            for operand in old_operands:
                operand_cores = list(self.cores_in_expression(operand, core))
                if len(operand_cores) == 1 and operand_cores[0] != core:
                    remove_core_from_fieldname(operand_cores[0], operand)
                    filter_queries.setdefault(operand_cores[0], []).append(operand)
                else:
                    expression.operands.append(operand)
            if len(expression.operands) == 1:
                expression = expression.operands[0]
            elif len(expression.operands) == 0:
                expression = None
        if expression is not None and self.cores_in_expression(expression, core) != {core}:
            raise TooComplexQueryExpression(
                "Multiple core query detected, but unable to convert to a "
                "correct composed query"
            )
        return expression, filter_queries

    def _other_cores(self, core: str) -> set[str]:
        return self._available_cores - {core}

    def cores_in_expression(self, expression: QueryExpression, core: str) -> set[str]:
        if expression.operator:
            result: set[str] = set()
            for operand in expression.operands:
                result.update(self.cores_in_expression(operand, core))
            return result
        return {self._find_core_prefix(expression.index, core)}

    def _find_core_prefix(self, fieldname: str | None, core: str) -> str:
        if fieldname and "." in fieldname:
            possible_core, _ = fieldname.split(".", 1)
            if possible_core in self._other_cores(core):
                return possible_core
        return core


def remove_core_from_fieldname(core: str, expression: QueryExpression) -> None:
    """Strip ``core.`` prefixes in place (extractfilterqueries.py:78-84)."""
    if expression.operator:
        for operand in expression.operands:
            remove_core_from_fieldname(core, operand)
        return
    if expression.index and expression.index.startswith(core + "."):
        expression.index = expression.index[len(core) + 1 :]


def _normalize_matches(matches) -> dict[tuple[str, str], tuple[str, str]]:
    """Accept the reference's (dict, dict) match tuples
    (``{'core': c, 'uniqueKey'|'key': col}`` — converttocomposedquerytest
    fixtures) or plain ((core, col), (core, col)) pairs."""
    out: dict[tuple[str, str], tuple[str, str]] = {}
    for spec1, spec2 in matches or []:
        if isinstance(spec1, dict):
            c1, k1 = spec1["core"], spec1.get("uniqueKey") or spec1.get("key")
            c2, k2 = spec2["core"], spec2.get("uniqueKey") or spec2.get("key")
        else:
            (c1, k1), (c2, k2) = spec1, spec2
        out[(c1, c2)] = (k1, k2)
    return out


class ConvertToComposedQuery:
    """M10: SRU arguments → ComposedQuery (converttocomposedquery.py:44-160)."""

    def __init__(
        self,
        results_from: str,
        matches=None,
        dedup_field_name: str | None = None,
        dedup_sort_field_name: str | None = None,
        dedup_by_default: bool = True,
        drilldown_fieldnames_translate: Callable[[str], str] = lambda s: s,
        cql_configs: dict[str, CqlConfig] | None = None,
        clustering_enabled: bool = True,
    ):
        self._results_from = results_from
        self._matches = _normalize_matches(matches)
        self._cores = {c for pair in self._matches for c in pair}
        self._dedup_field_name = dedup_field_name
        self._dedup_sort_field_name = dedup_sort_field_name
        self._dedup_by_default = dedup_by_default
        self._translate = drilldown_fieldnames_translate
        self._cfgs = cql_configs or {}
        self._clustering_enabled = clustering_enabled
        self._extract = ExtractFilterQueries(self._cores)

    def _cfg(self, core: str) -> CqlConfig:
        cfg = self._cfgs.get(core)
        if cfg is not None:
            return cfg
        return CqlConfig(strict=False)

    def _to_ast(self, core: str, expr_or_str):
        e = cql_to_expression(expr_or_str) if isinstance(expr_or_str, str) else expr_or_str
        return expression_to_query(e, self._cfg(core))

    def convert(
        self,
        query: str | QueryExpression | None = None,
        extra_arguments: dict[str, list[str]] | None = None,
        facets=None,
        drilldown_queries=None,
        filter_queries=None,
        exclude_filter_queries=None,
        sort_keys=None,
        start: int = 0,
        stop: int = 10,
        suggestion_request: dict | None = None,
    ) -> ComposedQuery:
        extra = extra_arguments or {}
        rf = self._results_from
        expr = cql_to_expression(query or "*") if isinstance(query, (str, type(None))) else query
        # start/stop/suggestionRequest pass straight through
        # (converttocomposedquery.py:69-72)
        cq = ComposedQuery(
            result_core=rf, start=start, stop=stop, suggestion_request=suggestion_request
        )
        cq.matches = dict(self._matches)

        core_query, filters = self._extract.convert(expr, rf)
        if core_query is not None:
            cq.queries[rf] = self._to_ast(rf, core_query)
        for core, fexprs in filters.items():
            for f in fexprs:
                if f.must_not:
                    f.must_not = False
                    cq.exclude_filter_queries.setdefault(core, []).append(
                        self._to_ast(core, f)
                    )
                else:
                    cq.filter_queries.setdefault(core, []).append(self._to_ast(core, f))

        for sort_key in sort_keys or []:
            core, sort_by = self._parse_core_prefix(sort_key["sortBy"], self._cores)
            cq.sort_keys.append((core, sort_by, bool(sort_key.get("sortDescending"))))

        for f in extra.get("x-filter", []):
            core, filter_query = self._parse_core_prefix(f, self._cores)
            cq.filter_queries.setdefault(core, []).append(self._to_ast(core, filter_query))
        for core, filter_query in filter_queries or []:
            cq.filter_queries.setdefault(core, []).append(self._to_ast(core, filter_query))
        for core, exclude_query in exclude_filter_queries or []:
            cq.exclude_filter_queries.setdefault(core, []).append(
                self._to_ast(core, exclude_query)
            )

        rank_queries = extra.get("x-rank-query", [])
        if rank_queries:
            grouped: dict[str, list[str]] = defaultdict(list)
            for rank_query in rank_queries:
                core, rq = self._parse_core_prefix(rank_query, self._cores)
                grouped[core].append(rq)
            for core, qs in grouped.items():
                cq.rank_queries[core] = self._to_ast(core, " OR ".join(qs))

        common_keys_field = extra.get("x-filter-common-keys-field", [self._dedup_field_name])[0]
        default_flag = "true" if self._dedup_by_default else "false"
        if common_keys_field and "true" == extra.get("x-filter-common-keys", [default_flag])[0]:
            cq.dedup_field = (
                "" if common_keys_field.startswith(KEY_PREFIX) else KEY_PREFIX
            ) + common_keys_field
            cq.dedup_sort_field = self._dedup_sort_field_name

        if self._clustering_enabled and "true" == extra.get("x-clustering", [None])[0]:
            cq.clustering = True

        for drilldown_field in facets or []:
            parts = drilldown_field["fieldname"].split(">")
            fieldname, path = parts[0], parts[1:]
            core, new_fieldname = self._parse_core_prefix(fieldname, self._cores)
            new_fieldname = self._translate(new_fieldname)
            cq.facets.setdefault(core, []).append(
                {
                    "fieldname": new_fieldname,
                    "path": path,
                    "max_terms": drilldown_field.get("maxTerms"),
                }
            )

        for dq_field, dq_path in drilldown_queries or []:
            core, fieldname = self._parse_core_prefix(dq_field, self._cores)
            fieldname = self._translate(fieldname)
            cq.drilldown_queries.setdefault(core, []).append((fieldname, list(dq_path)))

        return cq

    def _parse_core_prefix(self, field: str, cores) -> tuple[str, str]:
        """converttocomposedquery.py:149-160: ``core.rest`` → (core, rest)
        when core is a known OTHER core; a leading results-from prefix keeps
        the field verbatim (testIgnoreCorePrefixForResultCore)."""
        if field.startswith(self._results_from):
            return self._results_from, field
        core = self._results_from
        try:
            tmpcore, tail = field.split(".", 1)
            if tmpcore in cores:
                core = tmpcore
                field = tail
        except ValueError:
            pass
        return core, field
