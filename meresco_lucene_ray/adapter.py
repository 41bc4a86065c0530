"""CQL/expression → per-core query adapters, the last step before a query
reaches the engine.

Re-expresses (same semantics, engine-AST output instead of the reference's
JSON query dialect):

- ``meresco/lucene/queryexpressiontolucenequerydict.py:42-75``
  (``QueryExpressionToLuceneQueryDict`` — analyzer/field-registry-aware
  expression conversion with updatable unqualified-term fields and a
  stemming ignore list; ``queryexpressiontolucenequerydicttest.py``, here
  via ``cql.expression_to_query`` which is the shared conversion core), and
- ``meresco/lucene/adaptertolucenequery.py:37-58`` (``AdapterToLuceneQuery``
  — routes a single-core query through its core's converter and a
  ``ComposedQuery`` through ``convertWith``; ``adaptertolucenequerytest.py``).

The reference converter emits its JSON wire dialect; ours emits the
engine AST that ``MultiSearcher``/``IndexSearcher`` execute directly —
``query.wireproto.ast_to_wire`` renders the identical reference dialect
from that AST, which is what the mirrored tests assert.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Callable

from .cql import CqlConfig, QueryExpression, cql_to_expression, expression_to_query

__all__ = ["QueryExpressionConverter", "AdapterToLuceneQuery"]


class QueryExpressionConverter:
    """QueryExpressionToLuceneQueryDict analog: a per-core callable that
    converts a CQL string / ``QueryExpression`` into an engine query AST
    under that core's schema config.

    ``convert`` accepts the exact keyword protocol ``ComposedQuery.
    convert_with`` uses (``unqualifiedTermFields``, ``composedQuery`` —
    camelCase on the wire, converttocomposedquery/adapter contract).
    """

    def __init__(
        self,
        unqualified_term_fields=None,
        settings=None,
        cfg: CqlConfig | None = None,
        ignore_stemming_for_words=None,
    ):
        if cfg is None:
            cfg = CqlConfig(strict=False)
            # one tokenized text field per core in this engine: a single
            # unqualified term field IS that core's text column, so the
            # unqualified term is analyzed like the reference's TextField
            if unqualified_term_fields is not None and len(unqualified_term_fields) == 1:
                cfg = replace(cfg, text_col=unqualified_term_fields[0][0])
        if settings is not None:
            # analyzer selection like the reference's
            # luceneSettings.createAnalyzer() (:45-46)
            from .settings import _ANALYZER_KINDS

            kind, stem = _ANALYZER_KINDS[settings.analyzer["type"]]
            stem_fields = (
                frozenset(settings.stemming_fields) if stem == "dutch" else None
            )
            cfg = replace(cfg, analyzer=kind, dutch_stem_fields=stem_fields)
        if unqualified_term_fields is not None:
            cfg = replace(
                cfg,
                unqualified_fields=tuple(
                    (f, float(b)) for f, b in unqualified_term_fields
                ),
            )
        if ignore_stemming_for_words is not None:
            cfg = replace(
                cfg, ignore_stemming_for_words=frozenset(ignore_stemming_for_words)
            )
        self._cfg = cfg

    # updateUnqualifiedTermFields (:50-51)
    def update_unqualified_term_fields(self, unqualified_term_fields) -> None:
        self._cfg = replace(
            self._cfg,
            unqualified_fields=tuple(
                (f, float(b)) for f, b in unqualified_term_fields
            ),
        )

    # updateIgnoreStemmingForWords (:53-54)
    def update_ignore_stemming_for_words(self, words) -> None:
        self._cfg = replace(self._cfg, ignore_stemming_for_words=frozenset(words))

    # convert (:60-71); the top-level must_not wrap lives in
    # expression_to_query (cql.py) like the reference's :61-65
    def convert(
        self,
        expression: str | QueryExpression,
        unqualifiedTermFields=None,
        composedQuery=None,
        **_ignored: Any,
    ):
        e = (
            cql_to_expression(expression)
            if isinstance(expression, str)
            else expression
        )
        cfg = self._cfg
        if unqualifiedTermFields:
            cfg = replace(
                cfg,
                unqualified_fields=tuple(
                    (f, float(b)) for f, b in unqualifiedTermFields
                ),
            )
        return expression_to_query(e, cfg)

    def __call__(self, expression, **kwargs):
        return self.convert(expression, **kwargs)


class AdapterToLuceneQuery:
    """AdapterToLuceneQuery analog (adaptertolucenequery.py:37-58): holds
    one converter per core and a downstream executor; single-core queries
    are converted under their core's schema, composed queries are converted
    in place via ``ComposedQuery.convert_with``.

    ``downstream`` is any callable ``(core=..., lucene_query=...,
    filter_queries=..., **kw)``; ``downstream_composed`` any callable
    ``(query)`` — typically ``MultiSearcher.execute_composed`` or a
    recording stub in tests (the reference's Observable ``self.any`` hop).
    """

    def __init__(
        self,
        default_core: str,
        core_converters: dict[str, Callable],
        downstream: Callable | None = None,
        downstream_composed: Callable | None = None,
    ):
        self._default_core = default_core
        self._converts = dict(core_converters)
        self._downstream = downstream
        self._downstream_composed = downstream_composed

    def execute_query(
        self,
        query=None,
        core: str | None = None,
        filter_queries=None,
        cql_abstract_syntax_tree=None,
        **kwargs: Any,
    ):
        # 'cqlAbstractSyntaxTree' alias accepted like :43-44
        if cql_abstract_syntax_tree is not None:
            query = cql_abstract_syntax_tree
        expression = (
            cql_to_expression(query) if isinstance(query, str) else query
        )
        if core is None:
            core = self._default_core
        convert = self._converts[core]
        if filter_queries:
            filter_queries = [
                convert(
                    cql_to_expression(fq) if isinstance(fq, str) else fq
                )
                for fq in filter_queries
            ]
        if self._downstream is None:
            raise ValueError("no downstream executor configured")
        return self._downstream(
            core=core,
            lucene_query=convert(expression),
            filter_queries=filter_queries,
            **kwargs,
        )

    def execute_composed_query(self, query):
        query.convert_with(**self._converts)
        if self._downstream_composed is None:
            raise ValueError("no downstream composed executor configured")
        return self._downstream_composed(query)
