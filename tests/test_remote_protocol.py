"""Mirrors /root/reference/test/conversiontest.py — the remote JSON message
protocol (Conversion envelope with a typed-object registry).

Adaptations: the reference round-trips cqlparser ``CQL_QUERY`` ASTs via
``cql2string``/``parseString``; we round-trip :class:`ParsedCql` through our
own CQL parser with equality on the expression tree.  ComposedQuery query
values are whatever the transport carries (here: CQL strings and
QueryExpressions, as in the reference test)."""

import json

from meresco_lucene_ray.cql import QueryExpression
from meresco_lucene_ray.join.composed import ComposedQuery
from meresco_lucene_ray.remote import Conversion, ParsedCql


def test_conversion():  # testConversion
    kwargs = {"q": ParsedCql.parse("CQL"), "attr": {"qs": [ParsedCql.parse("qs")]}}
    dump = Conversion().json_dump_message("aMessage", **kwargs)
    assert isinstance(dump, str)
    message, loaded = Conversion().json_load_message(dump)
    assert message == "aMessage"
    assert loaded["q"] == ParsedCql.parse("CQL")
    assert loaded["attr"]["qs"] == [ParsedCql.parse("qs")]
    # whitespace variants compare equal (AST equality, not string equality)
    assert loaded["q"] == ParsedCql.parse("  CQL ")


def test_conversion_of_composed_query():  # testConversionOfComposedQuery
    conversion = Conversion()
    cq = ComposedQuery("coreA")
    cq.set_core_query(
        core="coreA", query="Q0", filter_queries=["Q1", "Q2"], facets=["F0", "F1"]
    )
    cq.set_core_query(
        core="coreB",
        query=QueryExpression.searchterm(term="Q3"),
        filter_queries=["Q4"],
    )
    cq.add_match(
        dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB")
    )
    cq.add_unite(
        dict(core="coreA", query="AQuery"), dict(core="coreB", query="anotherQuery")
    )
    cq.start = 0
    cq.sort_keys = [("coreA", "field", True)]

    dump = conversion.json_dump_message("aMessage", q=cq)
    assert isinstance(dump, str)
    message, loaded = conversion.json_load_message(dump)
    assert message == "aMessage"
    cq2 = loaded["q"]
    assert cq2.query_for("coreA") == "Q0"
    # the nested QueryExpression survives the double encoding
    assert cq2.query_for("coreB") == QueryExpression.searchterm(term="Q3")
    assert cq2.matches == cq.matches
    assert cq2.sort_keys == cq.sort_keys


def test_query_expression():  # testQueryExpression
    conversion = Conversion()
    dump = conversion.json_dump_message(
        "aMessage", q=QueryExpression.searchterm(term="term")
    )
    message, loaded = conversion.json_load_message(dump)
    assert message == "aMessage"
    assert loaded == {"q": QueryExpression.searchterm(term="term")}


def test_query_expression_with_operands():  # testQueryExpressionWithOperands
    conversion = Conversion()
    qe = QueryExpression.nested(operator="AND")
    qe.operands = [
        QueryExpression.searchterm(term="term"),
        QueryExpression.searchterm(term="term1"),
    ]
    dump = conversion.json_dump_message("aMessage", q=qe)
    message, loaded = conversion.json_load_message(dump)
    assert message == "aMessage"
    assert loaded == {"q": qe}


def test_special_object():  # testSpecialObject
    class MyObject:
        def as_dict(self):
            return {"this": "dict"}

        @classmethod
        def from_dict(cls, d):
            assert d == {"this": "dict"}
            return cls()

    conversion = Conversion()
    conversion._add_object("__MyObject__", MyObject)
    dump = conversion.json_dump_message("aMessage", q="query", object=MyObject())
    assert json.loads(dump) == {
        "kwargs": {"object": {"__MyObject__": '{"this": "dict"}'}, "q": "query"},
        "message": "aMessage",
    }
    message, loaded = conversion.json_load_message(dump)
    assert message == "aMessage"
    assert loaded["q"] == "query"
    assert isinstance(loaded["object"], MyObject)
