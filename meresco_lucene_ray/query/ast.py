"""Query AST — the re-expression of the reference's JSON query protocol.

Mirrors the query types the reference's JsonQueryConverter materializes
(/root/reference/src/org/meresco/lucene/JsonQueryConverter.java:189-339):
MatchAllDocsQuery, TermQuery, BooleanQuery (MUST/SHOULD/MUST_NOT/FILTER),
PhraseQuery, PrefixQuery, WildcardQuery, RangeQuery (typed, in/exclusive
bounds) and boost wrappers.  DistanceQuery (lat/lon) is represented but only
supported when the index stores lat/lon docvalue columns.

Queries are plain frozen dataclasses; ``boost`` rides on each node (Lucene's
BoostQuery wrapper collapsed into an attribute).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Sequence


class Occur(enum.Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"


@dataclass(frozen=True)
class MatchAllQ:
    boost: float = 1.0


# Per-field postings are keyed on "<field>\x1f<term>" in the ONE sorted term
# dictionary (the reference keeps per-field Lucene postings,
# DocumentStringToDocument.java:84-158); the index's default text field
# stays unprefixed, so single-field indexes are byte-identical to before.
# \x1f (unit separator) cannot appear in analyzed tokens.
FIELD_SEP = "\x1f"


def full_term(field: str | None, term: str) -> str:
    """The posting-dictionary lookup key for a (field, term) pair."""
    return term if not field else f"{field}{FIELD_SEP}{term}"


@dataclass(frozen=True)
class TermQ:
    term: str
    boost: float = 1.0
    field: str | None = None  # None → the index's default text field


@dataclass(frozen=True)
class PhraseQ:
    terms: tuple[str, ...]
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class PrefixQ:
    """Constant-score multi-term query (Lucene's default rewrite)."""

    prefix: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class WildcardQ:
    """``*`` and ``?`` wildcards over index terms; constant-score."""

    pattern: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class RangeQ:
    """Range over a stored docvalue column (numeric or string)."""

    col: str
    lo: Any = None
    hi: Any = None
    include_lo: bool = True
    include_hi: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class DocValEqQ:
    """Keyword equality over a stored docvalue column (untokenized./drilldown
    term filter — cf. DrillDownQuery.term,
    /root/reference/src/org/meresco/lucene/Lucene.java:763-774)."""

    col: str
    value: Any
    boost: float = 1.0


@dataclass(frozen=True)
class PathPrefixQ:
    """Drilldown on a hierarchical facet path prefix (DrillDownQuery.term
    analog, Lucene.java:763-774): docs whose list<string> facet column
    starts with ``path``; non-scoring constant boost."""

    col: str
    path: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class GeoDistanceQ:
    """Lat/lon radius filter (DistanceQuery analog,
    JsonQueryConverter.java:330-339): docs whose stored lat/lon columns fall
    within ``radius_m`` meters (haversine) of the center; constant-score."""

    lat_col: str
    lon_col: str
    lat: float
    lon: float
    radius_m: float
    boost: float = 1.0


@dataclass(frozen=True)
class KeyFilterQ:
    """Broadcast key-bitset semi-join filter, the Ray-native KeyFilter
    (/root/reference/src/org/meresco/lucene/queries/KeyFilter.java:46-124).

    ``bitset`` is a numpy bool array indexed by key value; docs whose
    ``key_col`` value has its bit set pass (or don't, when ``inverted``).
    Non-scoring (FILTER semantics)."""

    key_col: str
    bitset: Any  # np.ndarray[bool] — unhashable, so compare by identity
    inverted: bool = False
    boost: float = 1.0

    def __eq__(self, other):  # identity compare for the bitset payload
        return self is other

    def __hash__(self):
        return id(self)


@dataclass(frozen=True)
class RelationalQ:
    """Cross-core clause embedded in a query tree — the RelationalLuceneQuery
    analog (/root/reference/meresco/lucene/queryexpressiontolucenequerydict.py:147-150):
    run ``query`` on ``core``, collect its ``collect_key_col`` key set, and
    filter the ENCLOSING core through ``filter_key_col`` (the result-side key
    column of the match).  Not evaluable per-segment — MultiSearcher resolves
    it to a KeyFilterQ bitset before fan-out, so it composes inside any
    boolean nesting (the reference skips the boolean-composition case:
    test 'testOtherCoreAndQuery' is @skip('not yet implemented')).
    Non-scoring (FILTER semantics)."""

    core: str
    collect_key_col: str
    filter_key_col: str
    query: Any
    boost: float = 1.0


@dataclass(frozen=True)
class BoolQ:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    boost: float = 1.0

    @staticmethod
    def of(clauses: Sequence[tuple[Occur, Any]], boost: float = 1.0) -> "BoolQ":
        groups: dict[Occur, list] = {o: [] for o in Occur}
        for occ, q in clauses:
            groups[occ].append(q)
        return BoolQ(
            must=tuple(groups[Occur.MUST]),
            should=tuple(groups[Occur.SHOULD]),
            must_not=tuple(groups[Occur.MUST_NOT]),
            filter=tuple(groups[Occur.FILTER]),
            boost=boost,
        )


Query = (
    MatchAllQ | TermQ | PhraseQ | PrefixQ | WildcardQ | RangeQ | DocValEqQ | KeyFilterQ | BoolQ
)


def query_terms(q) -> set[str]:
    """All posting-dictionary keys referenced by a query (for global df
    collection) — field-scoped terms appear as their full prefixed keys."""
    out: set[str] = set()
    if isinstance(q, TermQ):
        out.add(full_term(q.field, q.term))
    elif isinstance(q, PhraseQ):
        out.update(full_term(q.field, t) for t in q.terms)
    elif isinstance(q, BoolQ):
        for sub in (*q.must, *q.should, *q.must_not, *q.filter):
            out |= query_terms(sub)
    return out
