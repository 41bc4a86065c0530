"""Property test: query-wire round-trip on random AST trees (M11).

test_wireproto.py pins fixed wire dicts; hypothesis here generates random
query trees (every leaf type × boosts × field scoping × nested BoolQ) and
asserts ``wire_to_ast(json.loads(json.dumps(ast_to_wire(q))))`` returns the
CANONICAL form of q, where canonicalization is exactly the documented wire
lossiness (JsonQueryConverter.java:189-236 parity):

  * FILTER clauses ship as MUST (no FILTER occur on the wire) — non-scoring
    intent is a composed-query-level concept, not a wire one;
  * the default text field's name round-trips back to ``field=None``;
  * everything else — boosts, range bounds + types + inclusivity, phrase
    term order, drilldown paths, geo registry fields, relational nesting —
    must survive bit-exactly.

Relational trees round-trip through ``wire_to_relational`` (the
convertToRelationalQuery path), embedded RelationalQ through wire_to_ast.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.join import RelAnd, RelLeaf, RelNot, RelOr
from meresco_lucene_ray.query.ast import (
    BoolQ,
    DocValEqQ,
    GeoDistanceQ,
    MatchAllQ,
    PathPrefixQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    RelationalQ,
    TermQ,
    WildcardQ,
)
from meresco_lucene_ray.query.wireproto import (
    WireConfig,
    ast_to_wire,
    wire_to_ast,
    wire_to_relational,
)

CFG = WireConfig(
    text_col="content",
    text_cols=frozenset({"title"}),
    distance_fields={"geo": ("lat", "lon")},
)

_BOOST = st.sampled_from([1.0, 0.5, 2.0, 3.25])
_WORD = st.text(alphabet="abcz", min_size=1, max_size=6)
_FIELD = st.sampled_from([None, "title"])

_LEAF = st.one_of(
    st.just(MatchAllQ()),
    st.builds(TermQ, term=_WORD, boost=_BOOST, field=_FIELD),
    st.builds(
        PhraseQ,
        terms=st.lists(_WORD, min_size=1, max_size=3).map(tuple),
        boost=_BOOST,
        field=_FIELD,
    ),
    st.builds(PrefixQ, prefix=_WORD, boost=_BOOST, field=_FIELD),
    st.builds(WildcardQ, pattern=_WORD, boost=_BOOST, field=_FIELD),
    st.builds(DocValEqQ, col=st.just("lang"), value=_WORD, boost=_BOOST),
    st.builds(
        PathPrefixQ,
        col=st.just("cat"),
        path=st.lists(_WORD, min_size=1, max_size=3).map(tuple),
        boost=_BOOST,
    ),
    st.builds(
        GeoDistanceQ,
        lat_col=st.just("lat"),
        lon_col=st.just("lon"),
        lat=st.sampled_from([0.0, 52.5, -10.25]),
        lon=st.sampled_from([4.75, -120.0]),
        radius_m=st.sampled_from([100.0, 5000.0]),
        boost=_BOOST,
    ),
    # one RangeQ strategy per bound type so lo/hi never mix types
    st.builds(
        RangeQ,
        col=st.just("n"),
        lo=st.one_of(st.none(), st.integers(-5, 5)),
        hi=st.one_of(st.none(), st.integers(-5, 5)),
        include_lo=st.booleans(),
        include_hi=st.booleans(),
        boost=_BOOST,
    ),
    st.builds(
        RangeQ,
        col=st.just("x"),
        lo=st.one_of(st.none(), st.sampled_from([-1.5, 0.25, 3.0])),
        hi=st.one_of(st.none(), st.sampled_from([7.5, 100.0])),
        include_lo=st.booleans(),
        include_hi=st.booleans(),
        boost=_BOOST,
    ),
    st.builds(
        RangeQ,
        col=st.just("s"),
        lo=st.one_of(st.none(), _WORD),
        hi=st.one_of(st.none(), _WORD),
        include_lo=st.booleans(),
        include_hi=st.booleans(),
        boost=_BOOST,
    ),
)


def _bool(children):
    return st.builds(
        BoolQ,
        must=st.lists(children, max_size=2).map(tuple),
        should=st.lists(children, max_size=2).map(tuple),
        must_not=st.lists(children, max_size=2).map(tuple),
        filter=st.lists(children, max_size=2).map(tuple),
        boost=_BOOST,
    )


_QUERY = st.recursive(_LEAF, _bool, max_leaves=8)


def _canon(q):
    """The documented wire canonical form: FILTER folds into MUST."""
    if isinstance(q, BoolQ):
        return BoolQ(
            must=tuple(_canon(c) for c in q.must)
            + tuple(_canon(c) for c in q.filter),
            should=tuple(_canon(c) for c in q.should),
            must_not=tuple(_canon(c) for c in q.must_not),
            boost=q.boost,
        )
    if isinstance(q, RelationalQ):
        return RelationalQ(
            core=q.core,
            collect_key_col=q.collect_key_col,
            filter_key_col=q.filter_key_col,
            query=_canon(q.query),
            boost=q.boost,
        )
    return q


@settings(max_examples=200, deadline=None)
@given(q=_QUERY)
def test_query_wire_roundtrip(q):
    wire = json.loads(json.dumps(ast_to_wire(q, CFG)))
    assert wire_to_ast(wire, CFG) == _canon(q), q


_REL = st.recursive(
    st.builds(
        RelLeaf,
        core=st.sampled_from(["A", "B"]),
        collect_key_col=st.just("k"),
        filter_key_col=st.just("k"),
        query=_QUERY,
    ),
    lambda ch: st.one_of(
        st.builds(RelAnd, first=ch, second=ch),
        st.builds(RelOr, first=ch, second=ch),
        st.builds(RelNot, inner=ch),
    ),
    max_leaves=4,
)


def _canon_rel(e):
    if isinstance(e, RelLeaf):
        return RelLeaf(e.core, e.collect_key_col, e.filter_key_col, _canon(e.query))
    if isinstance(e, RelAnd):
        return RelAnd(_canon_rel(e.first), _canon_rel(e.second))
    if isinstance(e, RelOr):
        return RelOr(_canon_rel(e.first), _canon_rel(e.second))
    return RelNot(_canon_rel(e.inner))


@settings(max_examples=100, deadline=None)
@given(e=_REL)
def test_relational_wire_roundtrip(e):
    wire = json.loads(json.dumps(ast_to_wire(e, CFG)))
    assert wire_to_relational(wire, CFG) == _canon_rel(e), e


@settings(max_examples=100, deadline=None)
@given(
    q=_QUERY,
    core=st.sampled_from(["A", "B"]),
    boost=_BOOST,
)
def test_embedded_relational_roundtrip(q, core, boost):
    rq = RelationalQ(
        core=core, collect_key_col="k", filter_key_col="k", query=q, boost=boost
    )
    wire = json.loads(json.dumps(ast_to_wire(rq, CFG)))
    assert wire_to_ast(wire, CFG) == _canon(rq), rq
