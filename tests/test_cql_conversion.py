"""Mirrors /root/reference/test/queryexpressiontolucenequerydicttest.py —
the CQL-expression → query conversion semantics — against our engine AST
instead of the reference's JSON query protocol.

Adaptations (documented per case): our engine has ONE tokenized text field
per core (text_col), so "a tokenized field" maps to text_col and other
fields map to keyword/numeric/drilldown/distance registrations; the frozen
tokenizer splits on non-[a-z0-9_] (no ClassicTokenizer product-number or
dotted-acronym forms), so analyzed token lists differ where noted.
"""

import pytest

from meresco_lucene_ray.cql import (
    CqlConfig,
    CqlParseError,
    QueryExpression,
    cql_to_expression,
    cql_to_query,
    expression_to_query,
)
from meresco_lucene_ray.query.ast import (
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

# the reference test's setUp: unqualifiedTermFields=[("unqualified", 1.0)],
# a tokenized default field plus registered int/long fields
UNQUAL = CqlConfig(
    text_col="unqualified",
    numeric_cols=frozenset({"intField", "longField"}),
    unqualified_fields=(("unqualified", 1.0),),
)
FIELD = CqlConfig(text_col="field", numeric_cols=frozenset({"intField", "longField"}))


def conv(s, cfg=UNQUAL):
    return cql_to_query(s, cfg)


def test_term_query():  # testTermQuery via the expression API
    e = QueryExpression.searchterm("field", "=", "value")
    assert expression_to_query(e, FIELD) == TermQ("value")


def test_right_hand_side_is_lowercase():  # testRightHandSideIsLowercase
    assert conv("CaT") == TermQ("cat", boost=1.0)


def test_one_term_output_with_a_number():  # testOneTermOutputWithANumber
    assert conv("2005") == TermQ("2005", boost=1.0)


def test_match_all_query():  # testMatchAllQuery: '*' NOT expanded per field
    assert conv("*") == MatchAllQ()


def test_unqualified_term_fields_nested():  # testUnqualifiedTermFieldsWithNestedExpression
    e = QueryExpression.nested("AND")
    e.operands = [
        QueryExpression.searchterm(term="value1"),
        QueryExpression.searchterm(term="value2"),
    ]
    assert expression_to_query(e, UNQUAL) == BoolQ(
        must=(TermQ("value1", boost=1.0), TermQ("value2", boost=1.0))
    )


def test_multiple_unqualified_term_fields():  # testMultipleUnqualifiedTermFields
    # adapted: second unqualified field is a keyword column in our model
    cfg = CqlConfig(
        text_col="aField",
        keyword_cols=frozenset({"oField"}),
        unqualified_fields=(("aField", 1.0), ("oField", 2.0)),
    )
    assert cql_to_query("value", cfg) == BoolQ(
        should=(TermQ("value", boost=1.0), DocValEqQ("oField", "value", boost=2.0))
    )


def test_boolean_and_query():  # testBooleanAndQuery
    e = QueryExpression.nested("AND")
    e.operands = [
        QueryExpression.searchterm("field", "=", "value1"),
        QueryExpression.searchterm("field", "=", "value2"),
    ]
    assert expression_to_query(e, FIELD) == BoolQ(
        must=(TermQ("value1"), TermQ("value2"))
    )


def test_boolean_or_query():  # testBooleanOrQuery
    e = QueryExpression.nested("OR")
    e.operands = [
        QueryExpression.searchterm("field", "=", "value1"),
        QueryExpression.searchterm("field", "=", "value2"),
    ]
    assert expression_to_query(e, FIELD) == BoolQ(
        should=(TermQ("value1"), TermQ("value2"))
    )


def test_boolean_not_query():  # testBooleanNotQuery
    e = QueryExpression.nested("AND")
    e.operands = [
        QueryExpression.searchterm("field", "=", "value1"),
        QueryExpression.searchterm("field", "=", "value2"),
    ]
    e.operands[1].must_not = True
    assert expression_to_query(e, FIELD) == BoolQ(
        must=(TermQ("value1"),), must_not=(TermQ("value2"),)
    )


def test_boolean_not_query_nested():  # testBooleanNotQueryNested
    e = QueryExpression.nested("AND")
    inner = QueryExpression.nested("AND")
    inner.must_not = True
    inner.operands = [
        QueryExpression.searchterm("field", "=", "value2"),
        QueryExpression.searchterm("field", "=", "value3"),
    ]
    e.operands = [QueryExpression.searchterm("field", "=", "value1"), inner]
    assert expression_to_query(e, FIELD) == BoolQ(
        must=(TermQ("value1"),),
        must_not=(BoolQ(must=(TermQ("value2"), TermQ("value3"))),),
    )


def test_not_expression():  # testNotExpression: top-level NOT wraps AND('*', ..)
    e = QueryExpression.searchterm("field", "=", "value")
    e.must_not = True
    assert expression_to_query(e, FIELD) == BoolQ(
        must=(MatchAllQ(),), must_not=(TermQ("value"),)
    )


def test_phrase_output():  # testPhraseOutput
    assert conv('"cats dogs"') == PhraseQ(("cats", "dogs"), boost=1.0)


def test_phrase_query_is_analyzed():  # testPhraseQueryIsStandardAnalyzed
    # adapted: frozen tokenizer splits vol.118 → vol,118 (no ClassicTokenizer)
    assert conv('"vol.118 (2008) nr.3 (March) p.435-444"') == PhraseQ(
        ("vol", "118", "2008", "nr", "3", "march", "p", "435", "444"), boost=1.0
    )


def test_one_term_phrase_query():  # testOneTermPhraseQueryUsesStandardAnalyzed
    assert conv("aap:noot") == PhraseQ(("aap", "noot"), boost=1.0)


def test_empty_phrase_if_no_valid_chars():  # testCreatesEmptyPhraseQueryIfNoValidCharsFound
    assert conv(":") == PhraseQ((), boost=1.0)


def test_standard_analyzer_keeps_stopwords():  # testStandardAnalyserWithoutStopWords
    assert conv('"no is the only option"') == PhraseQ(
        ("no", "is", "the", "only", "option"), boost=1.0
    )


def test_index_relation_term_output():  # testIndexRelationTermOutput
    cfg = CqlConfig(text_col="animal")
    assert cql_to_query("animal=cats", cfg) == TermQ("cats")
    assert cql_to_query('animal="cats dogs"', cfg) == PhraseQ(("cats", "dogs"))
    assert cql_to_query('animal="catS Dogs"', cfg) == PhraseQ(("cats", "dogs"))


def test_index_relation_exact_term_output():  # testIndexRelationExactTermOutput
    cfg = CqlConfig(text_col="animal")
    assert cql_to_query('animal exact "hairy cats"', cfg) == DocValEqQ(
        "animal", "hairy cats"
    )
    # exact values keep their case
    assert cql_to_query('animal exact "Capital Cats"', cfg) == DocValEqQ(
        "animal", "Capital Cats"
    )


def test_relation_boost():  # testBoost: '=/boost=2.0'
    cfg = CqlConfig(text_col="title")
    assert cql_to_query("title =/boost=2.0 cats", cfg) == TermQ("cats", boost=2.0)


def test_wildcards():  # testWildcards
    assert conv("prefix*") == PrefixQ("prefix", boost=1.0)
    assert conv("PREfix*") == PrefixQ("prefix", boost=1.0)
    cfg = CqlConfig(text_col="field")
    assert cql_to_query('field="PREfix*"', cfg) == PrefixQ("prefix")
    assert cql_to_query("field=prefix*", cfg) == PrefixQ("prefix")
    # single-char prefix degrades to a term query (prefixRegexp wants >= 2 chars)
    assert cql_to_query('field="P*"', cfg) == TermQ("p")
    # leading-star wildcard degrades to the bare term ("only prefix queries")
    assert cql_to_query('field="*post"', cfg) == TermQ("post")
    # multiple trailing stars degrade to the bare term
    assert cql_to_query("field=prefix**", cfg) == TermQ("prefix")
    # multi-field expansion of an unqualified prefix keeps per-field boosts;
    # adapted: second field is a keyword column (no prefix semantics there)
    cfg2 = CqlConfig(
        text_col="field0",
        keyword_cols=frozenset({"field1"}),
        unqualified_fields=(("field0", 0.2), ("field1", 2.0)),
    )
    assert cql_to_query("prefix*", cfg2) == BoolQ(
        should=(PrefixQ("prefix", boost=0.2), DocValEqQ("field1", "prefix*", boost=2.0))
    )


def test_magic_exact():  # testMagicExact: '=' on an untokenized field == exact
    cfg = CqlConfig(text_col="text", keyword_cols=frozenset({"animal"}))
    assert cql_to_query('animal = "cats dogs"', cfg) == cql_to_query(
        'animal exact "cats dogs"', cfg
    )


def test_text_range_query():  # testTextRangeQuery (string ranges, lenient mode)
    cfg = CqlConfig(text_col="text", strict=False)
    q = cql_to_query("field > value", cfg)
    assert q == RangeQ("field", lo="value", hi=None, include_lo=False, include_hi=True)
    q = cql_to_query("field >= value", cfg)
    assert q == RangeQ("field", lo="value", hi=None, include_lo=True, include_hi=True)
    q = cql_to_query("field < value", cfg)
    assert q == RangeQ("field", lo=None, hi="value", include_lo=True, include_hi=False)
    q = cql_to_query("field <= value", cfg)
    assert q == RangeQ("field", lo=None, hi="value", include_lo=True, include_hi=True)


def test_int_range_query():  # testIntRangeQuery
    assert conv("intField > 1") == RangeQ(
        "intField", lo=1, hi=None, include_lo=False, include_hi=True
    )
    assert conv("intField >= 1") == RangeQ(
        "intField", lo=1, hi=None, include_lo=True, include_hi=True
    )
    assert conv("intField < 3") == RangeQ(
        "intField", lo=None, hi=3, include_lo=True, include_hi=False
    )
    assert conv("intField <= 3") == RangeQ(
        "intField", lo=None, hi=3, include_lo=True, include_hi=True
    )
    both = RangeQ("intField", lo=3, hi=3, include_lo=True, include_hi=True)
    assert conv("intField = 3") == both
    # the expression API passes typed terms through
    assert (
        expression_to_query(
            QueryExpression.searchterm(index="intField", relation="exact", term=3),
            UNQUAL,
        )
        == both
    )
    assert (
        expression_to_query(
            QueryExpression.searchterm(index="intField", relation="=", term=3), UNQUAL
        )
        == both
    )


def test_long_range_query():  # testLongRangeQuery
    assert conv("longField >= 1") == RangeQ(
        "longField", lo=1, hi=None, include_lo=True, include_hi=True
    )
    assert conv("longField=5") == RangeQ(
        "longField", lo=5, hi=5, include_lo=True, include_hi=True
    )


def test_drilldown_field_query():  # testDrilldownFieldQuery
    cfg = CqlConfig(text_col="text", drilldown_cols=frozenset({"field"}))
    assert cql_to_query("field = value", cfg) == PathPrefixQ("field", ("value",))
    assert cql_to_query('field = "value>value1"', cfg) == PathPrefixQ(
        "field", ("value", "value1")
    )


def test_wildcard_query():  # testWildcardQuery: the magic '???*' literal
    cfg = CqlConfig(text_col="field")
    assert cql_to_query("field=???*", cfg) == WildcardQ("???*")


def test_unsupported_cql():  # testUnsupportedCQL
    with pytest.raises(CqlParseError):
        conv("index <> term")


def test_really_ignore_analyzed_away_terms():  # testReallyIgnoreAnalyzedAwayTerms
    assert conv(".") == PhraseQ((), boost=1.0)
    cfg = CqlConfig(text_col="abc")
    assert cql_to_query("abc=:;+", cfg) == PhraseQ(())
    # analyzed-away clauses drop from the enclosing boolean
    assert conv("abc AND :;+ AND def") == BoolQ(
        must=(TermQ("abc", boost=1.0), TermQ("def", boost=1.0))
    )


def test_lat_lon_field():  # testLatLonField
    cfg = CqlConfig(
        text_col="text", distance_fields={"latlonField": ("lat", "lon")}
    )
    assert cql_to_query('latlonField = "52.3,5.6,42"', cfg) == GeoDistanceQ(
        "lat", "lon", 52.3, 5.6, 42000.0
    )
    for bad in ['latlonField = "52.3"', 'latlonField = "52.3,5.6"',
                'latlonField = "lat,lon,radius"']:
        with pytest.raises(CqlParseError):
            cql_to_query(bad, cfg)
    with pytest.raises(CqlParseError):
        cql_to_query('latlonField > "52.3,5.6,43"', cfg)


# ---- Dutch-stemming post-analysis (the reference analyzer's post_analyse
# behavior; the commented testDutchStemming/testIgnoreStemming cases) -------

STEM = CqlConfig(text_col="unqualified", dutch_stem_fields=frozenset())


def test_dutch_stemming_expands_term():
    assert cql_to_query("katten", STEM) == BoolQ(
        should=(TermQ("katten", boost=1.0), TermQ("kat", boost=1.0))
    )


def test_phrase_does_no_dutch_stemming():  # testPhraseOutputDoesNoDutchStemming
    assert cql_to_query('"katten honden"', STEM) == PhraseQ(("katten", "honden"))


def test_dutch_stemming_only_for_given_fields():  # testDutchStemmingOnlyForGivenFields
    cfg = CqlConfig(
        text_col="unqualified",
        keyword_cols=frozenset({"field"}),
        dutch_stem_fields=frozenset({"unqualified"}),
    )
    assert cql_to_query("katten", cfg) == BoolQ(
        should=(TermQ("katten", boost=1.0), TermQ("kat", boost=1.0))
    )
    assert cql_to_query("field=katten", cfg) == DocValEqQ("field", "katten")


def test_ignore_stemming():  # testIgnoreStemming
    cfg = CqlConfig(
        text_col="unqualified",
        dutch_stem_fields=frozenset(),
        ignore_stemming_for_words=frozenset({"kate", "wageningen"}),
    )
    assert cql_to_query("kate", cfg) == TermQ("kate", boost=1.0)
    assert cql_to_query("katten", cfg) == BoolQ(
        should=(TermQ("katten", boost=1.0), TermQ("kat", boost=1.0))
    )


def test_per_query_unqualified_fields():  # testPerQueryUnqualifiedFields
    e = cql_to_expression("value")
    cfg_a = CqlConfig(text_col="aField", unqualified_fields=(("aField", 1.0),))
    cfg_b = CqlConfig(
        text_col="aField",
        keyword_cols=frozenset({"anotherField"}),
        unqualified_fields=(("aField", 2.0), ("anotherField", 3.0)),
    )
    assert expression_to_query(e, cfg_a) == TermQ("value", boost=1.0)
    assert expression_to_query(e, cfg_b) == BoolQ(
        should=(TermQ("value", boost=2.0), DocValEqQ("anotherField", "value", boost=3.0))
    )


def test_query_side_analyzer_selection():
    """CqlConfig.analyzer matches the build-side IndexConfig.analyzer: the
    same text analyzed with classic/whitespace yields different terms than
    the frozen standard spec (MerescoStandardAnalyzer query parsing)."""
    std = CqlConfig(text_col="field")
    classic = CqlConfig(text_col="field", analyzer="classic")
    ws = CqlConfig(text_col="field", analyzer="whitespace")
    # standard splits AT&T into two terms -> phrase; classic keeps one token
    assert cql_to_query('"AT&T"', std) == PhraseQ(("at", "t"))
    assert cql_to_query('"AT&T"', classic) == TermQ("at&t", boost=1.0)
    # product number: one NUM token under classic, phrase under standard
    assert cql_to_query('"oc-0123"', classic) == TermQ("oc-0123", boost=1.0)
    assert cql_to_query('"oc-0123"', std) == PhraseQ(("oc", "0123"))
    # whitespace keeps case and punctuation
    assert cql_to_query('"Foo.Bar"', ws) == TermQ("Foo.Bar", boost=1.0)


def test_multiple_unqualified_text_fields_per_field_postings():
    # testMultipleUnqualifiedTermFields with BOTH unqualified fields as true
    # per-field text fields (queryexpressiontolucenequerydicttest.py:93-111)
    # — the reference's exact golden wire dict, including per-clause boosts
    from meresco_lucene_ray.query.wireproto import WireConfig, ast_to_wire

    cfg = CqlConfig(
        text_col="unqualified",
        text_cols=frozenset({"aField", "oField"}),
        unqualified_fields=(("aField", 1.0), ("oField", 2.0)),
    )
    q = cql_to_query("value", cfg)
    assert q == BoolQ(
        should=(
            TermQ("value", boost=1.0, field="aField"),
            TermQ("value", boost=2.0, field="oField"),
        )
    )
    wire = ast_to_wire(
        q, WireConfig(text_col="unqualified", text_cols=frozenset({"aField", "oField"}))
    )
    wire.pop("boost", None)  # the reference golden carries no outer boost
    assert wire == {
        "type": "BooleanQuery",
        "clauses": [
            {
                "type": "TermQuery",
                "term": {"field": "aField", "value": "value"},
                "boost": 1.0,
                "occur": "SHOULD",
            },
            {
                "type": "TermQuery",
                "term": {"field": "oField", "value": "value"},
                "boost": 2.0,
                "occur": "SHOULD",
            },
        ],
    }


def test_qualified_text_field_scopes_query():
    # a qualified query on a registered per-field text column converts to a
    # field-scoped term/phrase/prefix (DocumentStringToDocument.java:84-158
    # keeps per-field postings; _fieldQuery → _determineQuery :126-172)
    from meresco_lucene_ray.query.ast import PhraseQ, PrefixQ

    cfg = CqlConfig(text_col="body", text_cols=frozenset({"title"}))
    assert cql_to_query("title=word", cfg) == TermQ("word", field="title")
    assert cql_to_query('title="two words"', cfg) == PhraseQ(
        ("two", "words"), field="title"
    )
    assert cql_to_query("title=wor*", cfg) == PrefixQ("wor", field="title")
    # the default text field stays unscoped (field=None) — existing behavior
    assert cql_to_query("body=word", cfg) == TermQ("word")
