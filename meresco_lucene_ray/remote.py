"""Remote message protocol — the JSON envelope the reference speaks between
its Python observable tier and a remote Lucene service.

Re-expresses ``meresco/lucene/remote/_conversion.py:36-72`` (``Conversion``:
``jsonDumpMessage`` / ``jsonLoadMessage`` with an extensible typed-object
registry) for this engine's types: a message is
``{"message": name, "kwargs": {...}}`` where any value may be a registered
object encoded as a single-key dict ``{"__TYPE_TAG__": <json string of its
as_dict>}``.  Nested registered objects are supported in both directions
(the reference nests its converters through ``dumps(..., default=...)`` /
``object_hook``), and unknown tags pass through as plain dicts.

Built-in registrations mirror the reference's:

- ``__COMPOSED_QUERY__``  → :class:`~meresco_lucene_ray.join.composed.ComposedQuery`
- ``__QUERY_EXPRESSION__`` → :class:`~meresco_lucene_ray.cql.QueryExpression`
- ``__CQL_QUERY__``        → :class:`ParsedCql` (a parsed CQL string; the
  reference round-trips ``cqlparser.CQL_QUERY`` ASTs through ``cql2string``
  / ``parseString`` — we round-trip through our own parser, equality on the
  resulting expression tree, ``conversiontest.py:testConversion``).

Exercised by ``tests/test_remote_protocol.py`` mirroring
``/root/reference/test/conversiontest.py``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable

from .cql import QueryExpression, cql_to_expression
from .join.composed import ComposedQuery

__all__ = ["Conversion", "ParsedCql"]


@dataclass
class ParsedCql:
    """A CQL string plus its parsed expression — the analog of a
    ``cqlparser.CQL_QUERY`` AST.  Serialized as the source string
    (the reference uses ``cql2string``); equality is on the parsed tree so
    whitespace variants compare equal like the reference's AST equality."""

    cql: str
    expression: QueryExpression

    @classmethod
    def parse(cls, cql: str) -> "ParsedCql":
        return cls(cql=cql, expression=cql_to_expression(cql))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ParsedCql) and self.expression == other.expression


class Conversion:
    """JSON (de)serializer for remote messages (_conversion.py:36-72)."""

    def __init__(self) -> None:
        self._converters: list[dict[str, Any]] = []
        self._add_object("__COMPOSED_QUERY__", ComposedQuery)
        self._add_object("__QUERY_EXPRESSION__", QueryExpression)
        self._add_object(
            "__CQL_QUERY__",
            ParsedCql,
            as_dict=lambda p: p.cql,
            from_dict=ParsedCql.parse,
        )

    # ---- public API (jsonDumpMessage / jsonLoadMessage) -----------------
    def json_dump_message(self, message: str, **kwargs: Any) -> str:
        return json.dumps(
            {"message": message, "kwargs": kwargs}, default=self._dump_default
        )

    def json_load_message(self, s: str) -> tuple[str, dict[str, Any]]:
        result = json.loads(s, object_hook=self._load_object_hook)
        return result["message"], result["kwargs"]

    # ---- extension point (_addObject, used by testSpecialObject) --------
    def _add_object(
        self,
        tag: str,
        obj_type: type,
        as_dict: Callable[[Any], Any] | None = None,
        from_dict: Callable[[Any], Any] | None = None,
    ) -> "Conversion":
        self._converters.append(
            {
                "name": tag,
                "type": obj_type,
                "as_dict": obj_type.as_dict if as_dict is None else as_dict,
                "from_dict": obj_type.from_dict if from_dict is None else from_dict,
            }
        )
        return self

    # ---- internals ------------------------------------------------------
    def _dump_default(self, obj: Any) -> Any:
        for conv in self._converters:
            if isinstance(obj, conv["type"]):
                inner = conv["as_dict"](obj)
                return {conv["name"]: json.dumps(inner, default=self._dump_default)}
        raise TypeError(f"{obj!r} is not JSON serializable")

    def _load_object_hook(self, dct: dict) -> Any:
        for conv in self._converters:
            if conv["name"] in dct and len(dct) == 1:
                inner = json.loads(
                    dct[conv["name"]], object_hook=self._load_object_hook
                )
                return conv["from_dict"](inner)
        return dct
