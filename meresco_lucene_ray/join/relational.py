"""Relational key-set query algebra (J7) — composable cross-core expressions.

Re-expresses the reference's relational runner family
(/root/reference/src/org/meresco/lucene/search/join/relational/ —
RelationalLuceneQuery.java:37-163, JoinAndQuery.java:32-139, JoinOrQuery,
RelationalNotQuery, KeyBits.java:33-111, WrappedRelationalQuery.java):

- a LEAF runs a query on one core and collects a key bitset
  (``collect_key_col``), optionally pre-filtered by an incoming bitset on
  ``filter_key_col`` — the PUSHDOWN: an AND evaluates its first operand,
  then hands the resulting bitset to the second operand's scan so the
  second core only keeps matching keys;
- AND/OR combine bitsets; NOT inverts lazily (KeyBits.inverted) so
  ``A AND NOT B`` materializes one inversion instead of the full complement.

Evaluation is an explicit DAG over per-core IndexSearchers; every edge is a
packed bitset through the object store.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..query.ast import BoolQ, KeyFilterQ
from .bitsets import KeyBits


@dataclass(frozen=True)
class RelLeaf:
    """RelationalLuceneQuery analog: (core, collectKey, filterKey, query)."""

    core: str
    collect_key_col: str
    filter_key_col: str
    query: Any


@dataclass(frozen=True)
class RelAnd:
    first: Any
    second: Any


@dataclass(frozen=True)
class RelOr:
    first: Any
    second: Any


@dataclass(frozen=True)
class RelNot:
    inner: Any


class RelationalRunner:
    """Evaluate a relational expression to a KeyBits over one key space."""

    def __init__(self, cores: dict[str, Any], key_space: int):
        self.cores = cores
        self.key_space = key_space

    def execute(self, expr, filter_bits: KeyBits | None = None) -> KeyBits:
        if isinstance(expr, RelLeaf):
            q = expr.query
            if filter_bits is not None:
                q = BoolQ(
                    must=(q,),
                    filter=(KeyFilterQ(expr.filter_key_col, filter_bits.materialize()),),
                )
            bits = self.cores[expr.core].collect_keys(
                q, expr.collect_key_col, self.key_space
            )
            return KeyBits(bits)
        if isinstance(expr, RelAnd):
            # pushdown: first's result pre-filters second's scan
            # (JoinAndQuery.java:32-139)
            left = self.execute(expr.first, filter_bits)
            return self.execute(expr.second, left)
        if isinstance(expr, RelOr):
            left = self.execute(expr.first, filter_bits)
            right = self.execute(expr.second, filter_bits)
            return left | right
        if isinstance(expr, RelNot):
            # lazy inversion (KeyBits.java:61-92): evaluate WITHOUT pushdown,
            # invert; an enclosing AND applies its filter via the bitwise AND
            inner = self.execute(expr.inner, None)
            result = ~inner
            if filter_bits is not None:
                result = filter_bits & result
            return result
        raise TypeError(f"unsupported relational node: {type(expr)!r}")
