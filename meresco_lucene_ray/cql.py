"""CQL-ish query front-end: text query string → engine AST.

Re-expresses the reference's query front-end
(/root/reference/meresco/lucene/queryexpressiontolucenequerydict.py:77-263),
which converts CQL expressions into the JSON query protocol, with the same
observable behaviors:

- unqualified term → term query on the default text field; a configured
  ``unqualified_fields=[(field, boost), ...]`` list expands it into a
  SHOULD-boolean of boosted per-field queries (:95-116);
- trailing ``*`` → prefix query (:158-168);
- multi-word / quoted value → phrase query fallback (:170-183);
- ``field exact value`` / ``field == value`` → untokenized keyword equality
  (DocValEqQ) (:139-150);
- range relations ``< <= > >=`` on numeric fields → RangeQ (:200-214);
- AND / OR / NOT boolean composition with parentheses (:84-93);
- ``^boost`` suffix carries a boost onto the clause (:118-127).

This is a deliberately frozen subset grammar, parsed by a small
recursive-descent parser (the reference delegates parsing to the external
``cqlparser`` package; the conversion semantics are what we mirror).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analysis import tokenize
from .query.ast import BoolQ, DocValEqQ, MatchAllQ, PhraseQ, PrefixQ, RangeQ, TermQ

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<op><=|>=|==|=|<|>) |
        (?P<word>[^\s()<>=]+)
    )""",
    re.X,
)

_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")


@dataclass
class CqlConfig:
    text_col: str = "text"
    keyword_cols: frozenset[str] = frozenset()
    numeric_cols: frozenset[str] = frozenset()
    # unqualified-term multi-field boost expansion (:95-116)
    unqualified_fields: tuple[tuple[str, float], ...] = ()
    # lenient mode (the composed-query front door is schema-less like the
    # reference): unknown qualified fields become keyword equality instead
    # of raising
    strict: bool = True


@dataclass
class QueryExpression:
    """cqlparser.QueryExpression analog — the intermediate tree the
    composed-query front door operates on (core-prefixed field names intact).

    Either a nested boolean (``operator`` 'AND'/'OR' + ``operands``) or a
    search term (``index``/``relation``/``term``).  ``must_not`` marks a
    NOT-operand inside an AND, like cqlparser's flag."""

    operator: str | None = None
    operands: list = field(default_factory=list)
    index: str | None = None
    relation: str | None = None
    term: str | None = None
    boost: float = 1.0
    must_not: bool = False
    quoted: bool = False  # quoted bare terms bypass unqualified-field expansion

    @classmethod
    def nested(cls, operator: str) -> "QueryExpression":
        return cls(operator=operator)

    @classmethod
    def searchterm(
        cls, index=None, relation=None, term=None, boost=1.0
    ) -> "QueryExpression":
        return cls(index=index, relation=relation, term=term, boost=boost)

    def iter_fields(self):
        if self.operator:
            for op in self.operands:
                yield from op.iter_fields()
        else:
            yield self.index


class CqlParseError(ValueError):
    pass


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            if s[i:].strip():
                raise CqlParseError(f"cannot lex at {s[i:]!r}")
            break
        i = m.end()
        for kind in ("lparen", "rparen", "quoted", "op", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    """Parses the token stream into a ``QueryExpression`` tree (field names —
    including ``core.`` prefixes — preserved verbatim for the composed-query
    front door); ``expression_to_query`` converts the tree to the engine AST."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> QueryExpression:
        q = self.or_expr()
        if self.i != len(self.toks):
            raise CqlParseError(f"trailing tokens: {self.toks[self.i:]}")
        return q

    def or_expr(self) -> QueryExpression:
        parts = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        e = QueryExpression.nested("OR")
        e.operands = parts
        return e

    def and_expr(self) -> QueryExpression:
        operands = [self.not_expr()]
        n_not = 0
        while self.peek()[1] in ("AND", "NOT") and self.peek()[0] == "word":
            kind = self.next()[1]
            sub = self.not_expr()
            if kind == "NOT":
                sub.must_not = True  # 'a NOT b': b excluded (:84-93)
                n_not += 1
            operands.append(sub)
        if len(operands) == 1:
            return operands[0]
        e = QueryExpression.nested("AND")
        e.operands = operands
        return e

    def not_expr(self) -> QueryExpression:
        if self.peek() == ("lparen", "("):
            self.next()
            q = self.or_expr()
            if self.next()[0] != "rparen":
                raise CqlParseError("missing ')'")
            return q
        return self.clause()

    def clause(self) -> QueryExpression:
        kind, v = self.next()
        if kind == "quoted":
            e = QueryExpression.searchterm(term=v[1:-1].replace('\\"', '"'))
            e.quoted = True
            return e
        if kind != "word":
            raise CqlParseError(f"unexpected token {v!r}")
        nkind, nval = self.peek()
        if nkind == "op":
            self.next()
            vkind, vval = self.next()
            if vkind == "quoted":
                vval = vval[1:-1].replace('\\"', '"')
            elif vkind != "word":
                raise CqlParseError(f"expected value after relation, got {vval!r}")
            boost = 1.0
            m = _BOOST_RE.search(vval)
            if m and nval in ("=", "=="):
                boost = float(m.group(1))
                vval = vval[: m.start()]
            return QueryExpression.searchterm(index=v, relation=nval, term=vval, boost=boost)
        boost = 1.0
        m = _BOOST_RE.search(v)
        if m:
            boost = float(m.group(1))
            v = v[: m.start()]
        return QueryExpression.searchterm(term=v, boost=boost)


def cql_to_expression(expression: str) -> QueryExpression:
    """Parse a CQL-subset string into a ``QueryExpression`` tree (the
    cqlparser.cqlToExpression analog — field names kept verbatim)."""
    toks = _lex(expression)
    if not toks:
        return QueryExpression.searchterm(term="*")
    return _Parser(toks).parse()


def _relation_q(cfg: CqlConfig, fieldname: str, op: str, value: str, boost: float):
    if op in ("<", "<=", ">", ">="):
        if fieldname not in cfg.numeric_cols and cfg.strict:
            raise CqlParseError(f"range on non-numeric field {fieldname!r}")
        num = float(value) if "." in value else int(value)
        lo, hi = (num, None) if op in (">", ">=") else (None, num)
        return RangeQ(
            fieldname, lo=lo, hi=hi, include_lo=(op == ">="), include_hi=(op == "<=")
        )
    if op == "==" or fieldname in cfg.keyword_cols:
        if fieldname in cfg.numeric_cols:
            value = float(value) if "." in value else int(value)
        return DocValEqQ(fieldname, value, boost=boost)
    return _field_q(cfg, fieldname, value, boost)


def _field_q(cfg: CqlConfig, fieldname: str, value: str, boost: float):
    if fieldname == cfg.text_col:
        return _text_q(value, boost)
    if fieldname in cfg.keyword_cols:
        return DocValEqQ(fieldname, value, boost=boost)
    if not cfg.strict:
        # schema-less front-door mode: unknown fields are keyword equality
        return DocValEqQ(fieldname, value, boost=boost)
    raise CqlParseError(f"unknown field {fieldname!r}")


def _text_q(value: str, boost: float):
    if value == "*":
        return MatchAllQ(boost=boost)
    if value.endswith("*"):
        toks = tokenize(value[:-1])
        if len(toks) == 1:
            return PrefixQ(toks[0], boost=boost)  # prefix detection (:158-168)
    toks = tokenize(value)
    if not toks:
        return MatchAllQ(boost=boost)
    if len(toks) == 1:
        return TermQ(toks[0], boost=boost)
    return PhraseQ(tuple(toks), boost=boost)  # phrase fallback (:170-183)


def expression_to_query(e: QueryExpression, cfg: CqlConfig | None = None, composed=None):
    """Convert a ``QueryExpression`` tree into the engine query AST —
    the queryexpressiontolucenequerydict conversion semantics.

    ``composed`` (optional): a ComposedQuery-shaped context (``result_core``,
    ``matches``/``key_col``).  With it, a field carrying another core's
    prefix converts to a ``RelationalQ`` wrapping — the RelationalLuceneQuery
    emission of queryexpressiontolucenequerydict.py:147-150 — which
    MultiSearcher resolves to a key bitset at execute time, so core-prefixed
    clauses work ANYWHERE in the boolean tree (beyond the extract-filters
    AND-only path)."""
    cfg = cfg or CqlConfig()
    if e.operator == "OR":
        parts = tuple(expression_to_query(o, cfg, composed) for o in e.operands)
        return parts[0] if len(parts) == 1 else BoolQ(should=parts)
    if e.operator == "AND":
        must = tuple(
            expression_to_query(o, cfg, composed) for o in e.operands if not o.must_not
        )
        must_not = tuple(
            expression_to_query(o, cfg, composed) for o in e.operands if o.must_not
        )
        if len(must) == 1 and not must_not:
            return must[0]
        return BoolQ(must=must, must_not=must_not)
    if e.index is None:
        if cfg.unqualified_fields and not e.quoted:
            subs = tuple(
                _field_q(cfg, f, e.term, b * e.boost) for f, b in cfg.unqualified_fields
            )
            return subs[0] if len(subs) == 1 else BoolQ(should=subs, boost=1.0)
        return _text_q(e.term, e.boost)
    if composed is not None and "." in e.index:
        core, tail = e.index.split(".", 1)
        other_cores = {c for pair in composed.matches for c in pair} - {composed.result_core}
        if core in other_cores:
            from .query.ast import RelationalQ

            inner = _relation_q(cfg, tail, e.relation or "=", e.term, e.boost)
            return RelationalQ(
                core=core,
                collect_key_col=composed.key_col(core, composed.result_core),
                filter_key_col=composed.key_col(composed.result_core, core),
                query=inner,
            )
    return _relation_q(cfg, e.index, e.relation or "=", e.term, e.boost)


def cql_to_query(expression: str, cfg: CqlConfig | None = None):
    """Parse a CQL-subset expression into an engine query AST."""
    return expression_to_query(cql_to_expression(expression), cfg)
