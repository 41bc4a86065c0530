"""Mirrors /root/reference/test/org/meresco/lucene/JsonQueryConverterTest.java
(wire dict → query) and lucenequerycomposertest.py (query → wire dict) against
the engine AST, plus round-trip checks.

Adaptation: Lucene's Int/Long endpoint ±1 nudges and Double nextUp/nextDown
are the open-interval encoding; our RangeQ keeps the include flags, which
evaluates identically."""

from meresco_lucene_ray.join.relational import RelAnd, RelLeaf, RelNot, RelOr
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
from meresco_lucene_ray.query.wireproto import WireConfig, ast_to_wire, wire_to_ast

CFG = WireConfig(text_col="unqualified", distance_fields={"location": ("lat", "lon")})


def test_term_query():  # testTermQuery
    d = {"type": "TermQuery", "term": {"field": "field", "value": "value"}}
    assert wire_to_ast(d, CFG) == DocValEqQ("field", "value")
    d2 = {"type": "TermQuery", "term": {"field": "unqualified", "value": "cat"}}
    assert wire_to_ast(d2, CFG) == TermQ("cat")


def test_term_query_with_boost():  # testTermQueryWithBoost
    d = {
        "type": "TermQuery", "boost": 2.1,
        "term": {"field": "field", "value": "value"},
    }
    assert wire_to_ast(d, CFG) == DocValEqQ("field", "value", boost=2.1)


def test_match_all_docs_query():  # testMatchAllDocsQuery
    assert wire_to_ast({"type": "MatchAllDocsQuery"}, CFG) == MatchAllQ()


def test_boolean_should_query():  # testBooleanShouldQuery
    d = {
        "type": "BooleanQuery",
        "clauses": [
            {"type": "TermQuery", "boost": 1.0, "occur": "SHOULD",
             "term": {"field": "aField", "value": "value"}},
            {"type": "TermQuery", "boost": 2.0, "occur": "SHOULD",
             "term": {"field": "oField", "value": "value"}},
        ],
    }
    assert wire_to_ast(d, CFG) == BoolQ(
        should=(DocValEqQ("aField", "value", boost=1.0),
                DocValEqQ("oField", "value", boost=2.0))
    )


def test_boolean_must_and_must_not():  # testBooleanMustQuery shape
    d = {
        "type": "BooleanQuery",
        "clauses": [
            {"type": "TermQuery", "occur": "MUST",
             "term": {"field": "unqualified", "value": "a"}},
            {"type": "TermQuery", "occur": "MUST_NOT",
             "term": {"field": "unqualified", "value": "b"}},
        ],
    }
    assert wire_to_ast(d, CFG) == BoolQ(must=(TermQ("a"),), must_not=(TermQ("b"),))


def test_wildcard_and_prefix():  # testWildcardQuery / testPrefixQuery
    assert wire_to_ast(
        {"type": "WildcardQuery", "term": {"field": "unqualified", "value": "v?l*"}},
        CFG,
    ) == WildcardQ("v?l*")
    assert wire_to_ast(
        {"type": "PrefixQuery", "term": {"field": "unqualified", "value": "val"}},
        CFG,
    ) == PrefixQ("val")


def test_phrase_query():  # testPhraseQuery
    d = {
        "type": "PhraseQuery",
        "terms": [
            {"field": "unqualified", "value": "phrase"},
            {"field": "unqualified", "value": "query"},
        ],
    }
    assert wire_to_ast(d, CFG) == PhraseQ(("phrase", "query"))


def test_string_range_query():  # testTermRangeQueryBigger/Lower
    d = {
        "type": "RangeQuery", "rangeType": "String", "field": "field",
        "lowerTerm": None, "upperTerm": "value",
        "includeLower": False, "includeUpper": False,
    }
    assert wire_to_ast(d, CFG) == RangeQ(
        "field", None, "value", include_lo=False, include_hi=False
    )


def test_int_range_query():  # testIntRangeQuery (+NoBounds)
    d = {
        "type": "RangeQuery", "rangeType": "Int", "field": "field",
        "lowerTerm": 1, "upperTerm": 5, "includeLower": False, "includeUpper": True,
    }
    assert wire_to_ast(d, CFG) == RangeQ(
        "field", 1, 5, include_lo=False, include_hi=True
    )
    d_nb = dict(d, lowerTerm=None, upperTerm=None)
    assert wire_to_ast(d_nb, CFG) == RangeQ(
        "field", None, None, include_lo=False, include_hi=True
    )


def test_double_range_query():  # testDoubleRangeQuery
    d = {
        "type": "RangeQuery", "rangeType": "Double", "field": "field",
        "lowerTerm": 1, "upperTerm": 5.5, "includeLower": True, "includeUpper": True,
    }
    q = wire_to_ast(d, CFG)
    assert q == RangeQ("field", 1.0, 5.5, include_lo=True, include_hi=True)
    assert isinstance(q.lo, float)


def test_drilldown_query():  # testDrilldownQuery
    d = {
        "type": "TermQuery",
        "term": {"field": "dd-field", "path": ["value"], "type": "DrillDown"},
    }
    assert wire_to_ast(d, CFG) == PathPrefixQ("dd-field", ("value",))


def test_distance_query():  # testDistanceQuery
    d = {
        "type": "DistanceQuery", "field": "location",
        "lat": 52.03333, "lon": 5.65833, "radius": 42000,
    }
    assert wire_to_ast(d, CFG) == GeoDistanceQ(
        "lat", "lon", 52.03333, 5.65833, 42000.0
    )


def test_relational_query():  # testRelationalQuery (full tree)
    leaf = lambda core, ck, fk, f, v: {
        "type": "RelationalLuceneQuery", "core": core,
        "collectKeyName": ck, "filterKeyName": fk,
        "query": {"type": "TermQuery", "term": {"field": f, "value": v}},
    }
    d = {
        "type": "RelationalNotQuery",
        "query": {
            "type": "JoinAndQuery",
            "first": leaf("coreA", "__key__.A", "__key__.A", "field", "value"),
            "second": {
                "type": "JoinOrQuery",
                "first": leaf("coreB", "__key__.B", "__key__.A", "field0", "value0"),
                "second": leaf("coreA", "__key__.A", "__key__.B", "field1", "value1"),
            },
        },
    }
    got = wire_to_ast(d, CFG)
    assert got == RelNot(
        RelAnd(
            RelLeaf("coreA", "__key__.A", "__key__.A", DocValEqQ("field", "value")),
            RelOr(
                RelLeaf("coreB", "__key__.B", "__key__.A", DocValEqQ("field0", "value0")),
                RelLeaf("coreA", "__key__.A", "__key__.B", DocValEqQ("field1", "value1")),
            ),
        )
    )


def test_embedded_relational_leaf_becomes_relationalq():
    d = {
        "type": "BooleanQuery",
        "clauses": [
            {"type": "TermQuery", "occur": "MUST",
             "term": {"field": "unqualified", "value": "x"}},
            {"type": "RelationalLuceneQuery", "occur": "MUST",
             "core": "coreB", "collectKeyName": "K", "filterKeyName": "K",
             "query": {"type": "TermQuery",
                       "term": {"field": "unqualified", "value": "y"}}},
        ],
    }
    got = wire_to_ast(d, CFG)
    assert got == BoolQ(
        must=(TermQ("x"), RelationalQ("coreB", "K", "K", TermQ("y"))),
    )


def test_composer_term_output():  # lucenequerycomposertest.testOneTermOutput
    assert ast_to_wire(TermQ("cat", boost=1.0), CFG) == {
        "type": "TermQuery",
        "term": {"field": "unqualified", "value": "cat"},
        "boost": 1.0,
    }


def test_round_trip():
    cases = [
        MatchAllQ(),
        TermQ("cat", boost=2.5),
        DocValEqQ("lang", "en"),
        PhraseQ(("a", "b"), boost=1.5),
        PrefixQ("pre"),
        WildcardQ("w*ld"),
        RangeQ("n", 3, 9, include_lo=False, include_hi=True),
        RangeQ("s", "a", "b", include_lo=True, include_hi=False),
        RangeQ("d", 1.5, None),
        PathPrefixQ("facet", ("x", "y")),
        GeoDistanceQ("lat", "lon", 52.0, 5.6, 1000.0),
        BoolQ(must=(TermQ("m"),), should=(TermQ("s"),), must_not=(TermQ("n"),)),
        RelationalQ("coreB", "K", "K", TermQ("q")),
        RelNot(RelAnd(
            RelLeaf("coreA", "K", "K", TermQ("a")),
            RelLeaf("coreB", "K", "K", DocValEqQ("f", "v")),
        )),
    ]
    for q in cases:
        assert wire_to_ast(ast_to_wire(q, CFG), CFG) == q, q


def test_cql_pipeline_to_wire():
    """CQL string → engine AST → reference wire dict — the full outbound
    path a reference client's server would receive."""
    from meresco_lucene_ray.cql import CqlConfig, cql_to_query

    q = cql_to_query("cat AND dog", CqlConfig(text_col="unqualified"))
    wire = ast_to_wire(q, CFG)
    assert wire["type"] == "BooleanQuery"
    assert [c["occur"] for c in wire["clauses"]] == ["MUST", "MUST"]
    assert wire_to_ast(wire, CFG) == q
