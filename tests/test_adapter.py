"""Mirrors /root/reference/test/adaptertolucenequerytest.py (the per-core
CQL→query adapter in front of the engine) and the converter-construction
corners of queryexpressiontolucenequerydicttest.py that only surface here
(updatable unqualified-term fields, settings-driven analyzer selection).

The reference converter emits its JSON query dialect; ours emits engine
ASTs — `ast_to_wire` renders the identical dialect, which the composed-query
case asserts verbatim against the reference test's expected reprs."""

from meresco_lucene_ray.adapter import AdapterToLuceneQuery, QueryExpressionConverter
from meresco_lucene_ray.cql import cql_to_expression
from meresco_lucene_ray.join.composed import ComposedQuery
from meresco_lucene_ray.query.ast import BoolQ, DocValEqQ, TermQ
from meresco_lucene_ray.query.wireproto import WireConfig, ast_to_wire
from meresco_lucene_ray.settings import LuceneSettings


class Recorder:
    def __init__(self):
        self.calls = []

    def query(self, **kw):
        self.calls.append(("executeQuery", kw))

    def composed(self, query):
        self.calls.append(("executeComposedQuery", query))

    def called_method_names(self):
        return [name for name, _ in self.calls]


def make_adapter(recorder):
    # setUp: QueryExpressionToLuceneQueryDict([('fieldA', 1.0)], ...) per core
    core_a = QueryExpressionConverter(
        unqualified_term_fields=[("fieldA", 1.0)], settings=LuceneSettings()
    )
    core_b = QueryExpressionConverter(
        unqualified_term_fields=[("fieldB", 1.0)], settings=LuceneSettings()
    )
    return AdapterToLuceneQuery(
        default_core="A",
        core_converters=dict(A=core_a, B=core_b),
        downstream=recorder.query,
        downstream_composed=recorder.composed,
    )


def test_convert_composed_query():  # testConvertComposedQuery
    recorder = Recorder()
    adapter = make_adapter(recorder)
    q = ComposedQuery(result_core="A")
    q.set_core_query(core="A", query=cql_to_expression("valueAQ"))
    q.set_core_query(core="B", query=cql_to_expression("valueBQ"))
    q.add_match(dict(core="A", uniqueKey="keyA"), dict(core="B", key="keyB"))
    q.add_unite(
        dict(core="A", query=cql_to_expression("fieldUA exact valueUA")),
        dict(core="B", query=cql_to_expression("fieldUB exact valueUB")),
    )
    q.validate()
    adapter.execute_composed_query(q)
    assert recorder.called_method_names() == ["executeComposedQuery"]
    assert ast_to_wire(q.query_for("A"), WireConfig(text_col="fieldA")) == {
        "type": "TermQuery",
        "term": {"field": "fieldA", "value": "valueaq"},
        "boost": 1.0,
    }
    assert ast_to_wire(q.query_for("B"), WireConfig(text_col="fieldB")) == {
        "type": "TermQuery",
        "term": {"field": "fieldB", "value": "valuebq"},
        "boost": 1.0,
    }


def test_single_core_query_uses_default_core():
    recorder = Recorder()
    adapter = make_adapter(recorder)
    adapter.execute_query(query="valueAQ", start=0, stop=10)
    (name, kw), = recorder.calls
    assert name == "executeQuery"
    assert kw["core"] == "A"
    assert kw["lucene_query"] == TermQ("valueaq", boost=1.0)
    assert kw["filter_queries"] is None
    assert (kw["start"], kw["stop"]) == (0, 10)


def test_single_core_query_explicit_core_and_filters():
    recorder = Recorder()
    adapter = make_adapter(recorder)
    adapter.execute_query(query="valueBQ", core="B", filter_queries=["other"])
    (_, kw), = recorder.calls
    assert kw["core"] == "B"
    assert kw["lucene_query"] == TermQ("valuebq", boost=1.0)
    assert kw["filter_queries"] == [TermQ("other", boost=1.0)]


def test_cql_abstract_syntax_tree_alias():  # :43-44 kwargs pop
    recorder = Recorder()
    adapter = make_adapter(recorder)
    adapter.execute_query(cql_abstract_syntax_tree="valueAQ")
    (_, kw), = recorder.calls
    assert kw["lucene_query"] == TermQ("valueaq", boost=1.0)


def test_converter_unqualified_override_via_convert_kwarg():
    conv = QueryExpressionConverter(unqualified_term_fields=[("fieldA", 1.0)])
    # convert_with's result-core protocol passes camelCase kwargs through
    q = conv.convert(
        cql_to_expression("term"),
        unqualifiedTermFields=[("other", 2.0)],
        composedQuery=object(),
    )
    # "other" is not the converter's text column -> keyword equality
    assert q == DocValEqQ("other", "term", boost=2.0)


def test_converter_update_unqualified_term_fields():
    conv = QueryExpressionConverter(unqualified_term_fields=[("fieldA", 1.0)])
    conv.update_unqualified_term_fields([("x", 1.0), ("y", 3.0)])
    q = conv("value")
    assert isinstance(q, BoolQ)
    assert set(q.should) == {
        DocValEqQ("x", "value", boost=1.0),
        DocValEqQ("y", "value", boost=3.0),
    }


def test_converter_settings_analyzer_selection():
    conv = QueryExpressionConverter(
        unqualified_term_fields=[("f", 1.0)],
        settings=LuceneSettings(
            analyzer={"type": "MerescoDutchStemmingAnalyzer", "stemmingFields": ["f"]}
        ),
        ignore_stemming_for_words=["katten"],
    )
    # ignore list suppresses the OR(original, stem) expansion
    assert conv("katten") == TermQ("katten", boost=1.0)
    conv.update_ignore_stemming_for_words([])
    q = conv("katten")
    assert isinstance(q, BoolQ)  # OR(katten, kat)
