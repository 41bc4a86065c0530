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
    def __init__(self, tokens: list[tuple[str, str]], cfg: CqlConfig):
        self.toks = tokens
        self.i = 0
        self.cfg = cfg

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        q = self.or_expr()
        if self.i != len(self.toks):
            raise CqlParseError(f"trailing tokens: {self.toks[self.i:]}")
        return q

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return BoolQ(should=tuple(parts))

    def and_expr(self):
        must, must_not = [self.not_expr()], []
        while self.peek()[1] in ("AND", "NOT") and self.peek()[0] == "word":
            kind = self.next()[1]
            sub = self.not_expr()
            (must_not if kind == "NOT" else must).append(sub)
        if len(must) == 1 and not must_not:
            return must[0]
        # 'a NOT b' keeps a as the scoring clause, b excluded (:84-93)
        return BoolQ(must=tuple(must), must_not=tuple(must_not))

    def not_expr(self):
        if self.peek() == ("lparen", "("):
            self.next()
            q = self.or_expr()
            if self.next()[0] != "rparen":
                raise CqlParseError("missing ')'")
            return q
        return self.clause()

    def clause(self):
        kind, v = self.next()
        if kind == "quoted":
            return self._text_query(v[1:-1].replace('\\"', '"'), 1.0)
        if kind != "word":
            raise CqlParseError(f"unexpected token {v!r}")
        # field relation?
        nkind, nval = self.peek()
        if nkind == "op":
            self.next()
            vkind, vval = self.next()
            if vkind == "quoted":
                vval = vval[1:-1].replace('\\"', '"')
            elif vkind != "word":
                raise CqlParseError(f"expected value after relation, got {vval!r}")
            return self._relation(v, nval, vval)
        # bare term (with optional ^boost)
        boost = 1.0
        m = _BOOST_RE.search(v)
        if m:
            boost = float(m.group(1))
            v = v[: m.start()]
        if self.cfg.unqualified_fields:
            subs = tuple(
                self._field_query(f, v, b * boost) for f, b in self.cfg.unqualified_fields
            )
            return subs[0] if len(subs) == 1 else BoolQ(should=subs, boost=1.0)
        return self._text_query(v, boost)

    def _relation(self, fieldname: str, op: str, value: str):
        boost = 1.0
        m = _BOOST_RE.search(value)
        if m and op in ("=", "=="):
            boost = float(m.group(1))
            value = value[: m.start()]
        if op in ("<", "<=", ">", ">="):
            if fieldname not in self.cfg.numeric_cols:
                raise CqlParseError(f"range on non-numeric field {fieldname!r}")
            num = float(value) if "." in value else int(value)
            lo, hi = (num, None) if op in (">", ">=") else (None, num)
            return RangeQ(
                fieldname,
                lo=lo,
                hi=hi,
                include_lo=(op == ">="),
                include_hi=(op == "<="),
            )
        if op == "==" or fieldname in self.cfg.keyword_cols:
            if fieldname in self.cfg.numeric_cols:
                value = float(value) if "." in value else int(value)
            return DocValEqQ(fieldname, value, boost=boost)
        return self._field_query(fieldname, value, boost)

    def _field_query(self, fieldname: str, value: str, boost: float):
        if fieldname == self.cfg.text_col:
            return self._text_query(value, boost)
        if fieldname in self.cfg.keyword_cols:
            return DocValEqQ(fieldname, value, boost=boost)
        raise CqlParseError(f"unknown field {fieldname!r}")

    def _text_query(self, value: str, boost: float):
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


def cql_to_query(expression: str, cfg: CqlConfig | None = None):
    """Parse a CQL-subset expression into an engine query AST."""
    cfg = cfg or CqlConfig()
    toks = _lex(expression)
    if not toks:
        return MatchAllQ()
    return _Parser(toks, cfg).parse()
