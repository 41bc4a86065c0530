"""CQL-ish query front-end: text query string → engine AST.

Re-expresses the reference's query front-end
(/root/reference/meresco/lucene/queryexpressiontolucenequerydict.py:77-263),
which converts CQL expressions into the JSON query protocol, with the same
observable behaviors:

- unqualified term → term query on the default text field; a configured
  ``unqualified_fields=[(field, boost), ...]`` list expands it into a
  SHOULD-boolean of boosted per-field queries (:107-125); unqualified ``*``
  stays a single MatchAll before expansion (:108-109);
- trailing ``*`` after ≥2 word chars → prefix query (prefixRegexp :257,
  :154-155); a single-char or multi-star value degrades to a term query;
- the magic literal ``???*`` → wildcard query (:167-168);
- multi-word / quoted value → phrase query fallback (:169-172); a value whose
  tokens are all analyzed away yields an EMPTY phrase (matches nothing), and
  empty clauses are dropped from enclosing booleans (_isEmptyQuery :225-228);
- ``field exact value`` / ``field == value`` → untokenized keyword equality
  (DocValEqQ) (:135-137);
- range relations ``< <= > >=`` on numeric fields → RangeQ; numeric equality
  → a [v, v] both-inclusive range (_termRangeQuery :174-185);
- registered distance fields parse ``lat,lon,radius-km`` → GeoDistanceQ with
  the km→m multiplier (_distanceQuery :187-198, RADIUS_MULTIPLIER :252);
- hierarchical drilldown fields split values on ``>`` → PathPrefixQ
  (_createStringTerm :216-223);
- AND / OR / NOT boolean composition with parentheses (:94-105); a top-level
  ``must_not`` expression is wrapped as ``AND('*', expr)`` (convert :61-65);
- ``^boost`` suffix and the ``=/boost=N`` relation modifier carry a boost
  onto the clause (:143-144);
- optional Dutch-stemming post-analysis expands a single term into
  OR(original, stem), phrase terms excluded, with an ignore list
  (_post_analyzeToken :206-211; MerescoDutchStemmingAnalyzer semantics).

This is a deliberately frozen subset grammar, parsed by a small
recursive-descent parser (the reference delegates parsing to the external
``cqlparser`` package; the conversion semantics are what we mirror).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analysis import dutch_stem, tokenize, tokenize_classic, tokenize_whitespace
from .query.ast import (
    BoolQ,
    DocValEqQ,
    GeoDistanceQ,
    MatchAllQ,
    PathPrefixQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    TermQ,
    WildcardQ,
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<op>(?:<>|<=|>=|==|=|<|>)(?:/boost=\d+(?:\.\d+)?)?) |
        (?P<word>[^\s()<>=]+)
    )""",
    re.X,
)

_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")
# prefix queries need >= 2 leading word chars (prefixRegexp, reference :257)
_PREFIX_RE = re.compile(r"^([\w-]{2,})\*$")


@dataclass
class CqlConfig:
    text_col: str = "text"
    # ADDITIONAL tokenized fields with their own postings (matches
    # IndexConfig.text_fields): a qualified query on one converts to a
    # field-scoped TermQ/PhraseQ/PrefixQ — the per-field-postings model of
    # DocumentStringToDocument.java:84-158
    text_cols: frozenset[str] = frozenset()
    keyword_cols: frozenset[str] = frozenset()
    numeric_cols: frozenset[str] = frozenset()
    # unqualified-term multi-field boost expansion (:95-116)
    unqualified_fields: tuple[tuple[str, float], ...] = ()
    # lenient mode (the composed-query front door is schema-less like the
    # reference): unknown qualified fields become keyword equality instead
    # of raising
    strict: bool = True
    # FieldRegistry "Distance" query type (_distanceQuery :187-198):
    # pseudo-field -> (lat_col, lon_col) stored columns
    distance_fields: dict = field(default_factory=dict)
    # hierarchical drilldown fields: '=' splits the value on '>' into a
    # facet path (_createStringTerm :216-223)
    drilldown_cols: frozenset[str] = frozenset()
    # Dutch-stemming post-analysis (MerescoDutchStemmingAnalyzer.post_analyse):
    # None = off; frozenset() = all text fields; non-empty = only those fields
    dutch_stem_fields: frozenset[str] | None = None
    ignore_stemming_for_words: frozenset[str] = frozenset()
    # query-side analyzer, matching the index build's IndexConfig.analyzer
    # ("standard" frozen spec | "whitespace" | "classic")
    analyzer: str = "standard"

    def tokenize_fn(self):
        return {
            "standard": tokenize,
            "whitespace": tokenize_whitespace,
            "classic": tokenize_classic,
        }[self.analyzer]


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

    # ---- wire round-trip (cqlparser cqltoexpression asDict/fromDict) ----
    def as_dict(self) -> dict:
        d = {
            "operator": self.operator,
            "index": self.index,
            "relation": self.relation,
            "term": self.term,
            "boost": self.boost,
            "must_not": self.must_not,
            "quoted": self.quoted,
        }
        if self.operator:
            d["operands"] = [op.as_dict() for op in self.operands]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "QueryExpression":
        ops = [cls.from_dict(o) for o in d.get("operands", [])]
        return cls(
            operator=d.get("operator"),
            operands=ops,
            index=d.get("index"),
            relation=d.get("relation"),
            term=d.get("term"),
            boost=d.get("boost", 1.0),
            must_not=d.get("must_not", False),
            quoted=d.get("quoted", False),
        )


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
        if nkind == "op" or (nkind, nval) == ("word", "exact"):
            self.next()
            boost = 1.0
            if nkind == "op" and "/boost=" in nval:
                # '=/boost=2.0' relation modifier (reference :143-144)
                nval, bs = nval.split("/boost=", 1)
                boost = float(bs)
            vkind, vval = self.next()
            if vkind == "quoted":
                vval = vval[1:-1].replace('\\"', '"')
            elif vkind != "word":
                raise CqlParseError(f"expected value after relation, got {vval!r}")
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


_SUPPORTED_RELATIONS = ("=", "==", "exact", ">", ">=", "<=", "<")


def _relation_q(cfg: CqlConfig, fieldname: str, op: str, value: str, boost: float):
    if op not in _SUPPORTED_RELATIONS:
        # UnsupportedCQL analog (reference :129-130) — e.g. '<>'
        raise CqlParseError(f"{op!r} not supported for the field {fieldname!r}")
    if fieldname in cfg.distance_fields:
        return _distance_q(cfg, fieldname, op, value, boost)
    if fieldname in cfg.numeric_cols:
        # registry Int/Long/Double fields route ALL relations through range
        # queries; equality is a [v, v] both-inclusive range (:174-185)
        if isinstance(value, str):
            num = float(value) if "." in value else int(value)
        else:
            num = value  # the expression API passes typed terms through
        if op in ("=", "==", "exact"):
            return RangeQ(
                fieldname, lo=num, hi=num, include_lo=True, include_hi=True, boost=boost
            )
        lo, hi = (num, None) if op in (">", ">=") else (None, num)
        return RangeQ(
            fieldname,
            lo=lo,
            hi=hi,
            include_lo=(op == ">=" or lo is None),
            include_hi=(op == "<=" or hi is None),
            boost=boost,
        )
    if op in ("<", "<=", ">", ">="):
        if cfg.strict:
            raise CqlParseError(f"range on non-numeric field {fieldname!r}")
        lo, hi = (value, None) if op in (">", ">=") else (None, value)
        return RangeQ(
            fieldname,
            lo=lo,
            hi=hi,
            include_lo=(op == ">=" or lo is None),
            include_hi=(op == "<=" or hi is None),
            boost=boost,
        )
    if fieldname in cfg.drilldown_cols:
        # hierarchical drilldown: '>'-separated path (:216-223)
        return PathPrefixQ(fieldname, tuple(value.split(">")), boost=boost)
    if op in ("==", "exact") or fieldname in cfg.keyword_cols:
        return DocValEqQ(fieldname, value, boost=boost)
    return _field_q(cfg, fieldname, value, boost)


def _distance_q(cfg: CqlConfig, fieldname: str, op: str, value: str, boost: float):
    """``lat,lon,radius-km`` → GeoDistanceQ (_distanceQuery :187-198)."""
    if op not in ("=", "==", "exact"):
        raise CqlParseError(
            f"unsupported relation {op!r} for {fieldname!r}, expected '='"
        )
    parts = value.split(",")
    if len(parts) != 3:
        raise CqlParseError(
            f"unsupported format for {fieldname!r}, expected lat,lon,radius-km"
        )
    try:
        lat, lon, radius = (float(p) for p in parts)
    except ValueError:
        raise CqlParseError(
            f"unsupported format for {fieldname!r}, expected lat,lon,radius-km"
        )
    lat_col, lon_col = cfg.distance_fields[fieldname]
    # radius is given in km, the query wants meters (RADIUS_MULTIPLIER :252)
    return GeoDistanceQ(lat_col, lon_col, lat, lon, radius * 1000.0, boost=boost)


def _field_q(cfg: CqlConfig, fieldname: str, value: str, boost: float):
    if fieldname == cfg.text_col:
        return _text_q(cfg, fieldname, value, boost)
    if fieldname in cfg.text_cols:
        # per-field postings: same analyze/prefix/phrase decision tree,
        # scoped to the field's own posting space
        return _text_q(cfg, fieldname, value, boost, field=fieldname)
    if fieldname in cfg.keyword_cols:
        return DocValEqQ(fieldname, value, boost=boost)
    if not cfg.strict:
        # schema-less front-door mode: unknown fields are keyword equality
        return DocValEqQ(fieldname, value, boost=boost)
    raise CqlParseError(f"unknown field {fieldname!r}")


def _post_analyzed_term(
    cfg: CqlConfig, fieldname: str, token: str, boost: float, field: str | None = None
):
    """Single analyzed token → term query, optionally expanded to
    OR(original, stem) by Dutch-stemming post-analysis — the reference's
    _post_analyzeToken (:206-211) with MerescoDutchStemmingAnalyzer
    semantics (stem applies per configured field; phrase terms never
    stem; ignoreStemmingForWords bypasses)."""
    if cfg.dutch_stem_fields is None or token in cfg.ignore_stemming_for_words:
        return TermQ(token, boost=boost, field=field)
    if cfg.dutch_stem_fields and fieldname not in cfg.dutch_stem_fields:
        return TermQ(token, boost=boost, field=field)
    stem = dutch_stem(token)
    if stem == token:
        return TermQ(token, boost=boost, field=field)
    return BoolQ(
        should=(TermQ(token, boost=boost, field=field), TermQ(stem, boost=boost, field=field))
    )


def _text_q(cfg: CqlConfig, fieldname: str, value: str, boost: float, field: str | None = None):
    """_determineQuery (:151-172): analyze, then prefix / term / wildcard /
    phrase.  A value whose tokens all analyze away becomes an EMPTY phrase
    (matches nothing) so enclosing booleans can drop it (:225-228).
    ``field`` scopes the produced query to a non-default text field's
    postings."""
    toks = cfg.tokenize_fn()(value)
    if len(toks) == 1:
        if _PREFIX_RE.match(value):
            # prefixRegexp (:154-155, :257)
            return PrefixQ(toks[0], boost=boost, field=field)
        return _post_analyzed_term(cfg, fieldname, toks[0], boost, field=field)
    if value == "???*":  # the reference's magic wildcard literal (:167-168)
        return WildcardQ(value, boost=boost, field=field)
    return PhraseQ(tuple(toks), boost=boost, field=field)  # phrase fallback, may be empty


def is_empty_query(q) -> bool:
    """_isEmptyQuery (:225-228): analyzed-away phrase or clause-less boolean."""
    if isinstance(q, PhraseQ) and not q.terms:
        return True
    if isinstance(q, BoolQ) and not (q.must or q.should or q.must_not or q.filter):
        return True
    return False


def expression_to_query(
    e: QueryExpression, cfg: CqlConfig | None = None, composed=None, _inner=False
):
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
    if e.must_not and not _inner:
        # top-level NOT wraps as AND('*', expr) (convert :61-65)
        inner = expression_to_query(e, cfg, composed, _inner=True)
        return BoolQ(must=(MatchAllQ(),), must_not=(inner,))
    if e.operator == "OR":
        parts = tuple(
            q
            for o in e.operands
            if not is_empty_query(q := expression_to_query(o, cfg, composed, _inner=True))
        )
        return parts[0] if len(parts) == 1 else BoolQ(should=parts)
    if e.operator == "AND":
        must = tuple(
            q
            for o in e.operands
            if not o.must_not
            and not is_empty_query(q := expression_to_query(o, cfg, composed, _inner=True))
        )
        must_not = tuple(
            q
            for o in e.operands
            if o.must_not
            and not is_empty_query(q := expression_to_query(o, cfg, composed, _inner=True))
        )
        if len(must) == 1 and not must_not:
            return must[0]
        return BoolQ(must=must, must_not=must_not)
    if e.index is None:
        if e.term == "*":
            # unqualified '*' stays one MatchAll, before expansion (:108-109)
            return MatchAllQ(boost=e.boost)
        if cfg.unqualified_fields and not e.quoted:
            if len(cfg.unqualified_fields) == 1:
                # single unqualified field returns directly — even when the
                # term analyzes away to an empty phrase (:117-118)
                f, b = cfg.unqualified_fields[0]
                return _field_q(cfg, f, e.term, b * e.boost)
            subs = tuple(
                q
                for f, b in cfg.unqualified_fields
                if not is_empty_query(q := _field_q(cfg, f, e.term, b * e.boost))
            )
            return subs[0] if len(subs) == 1 else BoolQ(should=subs, boost=1.0)
        return _text_q(cfg, cfg.text_col, e.term, e.boost)
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
