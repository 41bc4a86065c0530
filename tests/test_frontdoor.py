"""M9 ExtractFilterQueries + M10 ConvertToComposedQuery — mirrors the
reference suites /root/reference/test/extractfilterqueriestest.py and
/root/reference/test/converttocomposedquerytest.py, then drives the front
door end-to-end through MultiSearcher."""

import pyarrow as pa
import pytest

from meresco_lucene_ray.cql import (
    CqlConfig,
    cql_to_expression,
    expression_to_query,
)
from meresco_lucene_ray.frontdoor import (
    KEY_PREFIX,
    ConvertToComposedQuery,
    ExtractFilterQueries,
    TooComplexQueryExpression,
)
from meresco_lucene_ray.query.ast import BoolQ, DocValEqQ, KeyFilterQ, MatchAllQ, TermQ

E = cql_to_expression


class TestExtractFilterQueries:
    def setup_method(self):
        self.convert = ExtractFilterQueries(["core1", "core2"]).convert

    def test_do_nothing_for_standard_query(self):
        query, filters = self.convert(E("field=value AND aap=noot"), "core1")
        assert query == E("field=value AND aap=noot")
        assert filters == {}

    def test_other_core_query_at_last(self):
        query, filters = self.convert(E("field=value AND core2.f=v"), "core1")
        assert query == E("field=value")
        assert filters == {"core2": [E("f=v")]}

    def test_other_core_query_at_first(self):
        query, filters = self.convert(E("core2.f=v AND field=value"), "core1")
        assert query == E("field=value")
        assert filters == {"core2": [E("f=v")]}

    def test_braces(self):
        query, filters = self.convert(E("(core2.f=v) AND field=value"), "core1")
        assert query == E("field=value")
        assert filters == {"core2": [E("f=v")]}

    def test_multiple_or_clauses(self):
        query, filters = self.convert(E("(core2.f=v OR core2.f=x) AND field=value"), "core1")
        assert query == E("field=value")
        assert filters == {"core2": [E("f=v OR f=x")]}

    def test_multiple_and_clauses(self):
        query, filters = self.convert(E("core2.f=v AND core2.y=x AND field=value"), "core1")
        assert query == E("field=value")
        assert filters == {"core2": [E("f=v"), E("y=x")]}

    def test_field_with_dot(self):
        query, filters = self.convert(E("f=v AND fie.ld=value"), "core1")
        assert query == E("f=v AND fie.ld=value")
        assert filters == {}

    def test_filters_at_begin_and_end(self):
        query, filters = self.convert(E("core2.a=b AND f=v AND core2.b=c"), "core1")
        assert query == E("f=v")
        assert filters == {"core2": [E("a=b"), E("b=c")]}

    def test_too_complex(self):
        with pytest.raises(TooComplexQueryExpression):
            self.convert(E("core2.a=b OR f=v"), "core1")
        with pytest.raises(TooComplexQueryExpression):
            self.convert(E("core1.f=v OR (core1.a=b AND core2.f=v)"), "core1")

    def test_core_query_in_other_core(self):
        query, filters = self.convert(E("core2.a=b"), "core1")
        assert query is None
        assert filters == {"core2": [E("a=b")]}

    def test_core_and_query_in_other_core(self):
        query, filters = self.convert(E("core2.a=b AND core2.x=y"), "core1")
        assert query is None
        assert filters == {"core2": [E("a=b"), E("x=y")]}

    def test_core_or_query_in_other_core(self):
        query, filters = self.convert(E("core2.a=b OR core2.x=y"), "core1")
        assert query is None
        assert filters == {"core2": [E("a=b OR x=y")]}

    def test_not_query_in_other_core(self):
        query, filters = self.convert(E("a=b NOT core2.x=y"), "core1")
        assert query == E("a=b")
        expected = E("x=y")
        expected.must_not = True
        assert filters == {"core2": [expected]}


MATCHES = [
    ({"core": "defaultCore", "uniqueKey": "keyDefault"}, {"core": "otherCore", "key": "keyOther"}),
    ({"core": "defaultCore", "uniqueKey": "key1"}, {"core": "aDifferentKore", "key": "key2"}),
]


def _converter(**kw):
    args = dict(
        results_from="defaultCore",
        matches=MATCHES,
        dedup_field_name="__key__.dedup",
        dedup_sort_field_name="__key__.date",
        dedup_by_default=True,
        drilldown_fieldnames_translate=lambda n: "prefix." + n if n == "toBePrefixed" else n,
    )
    args.update(kw)
    return ConvertToComposedQuery(**args)


def _ast(s):
    return expression_to_query(cql_to_expression(s), CqlConfig(strict=False))


class TestConvertToComposedQuery:
    def test_x_filter(self):
        cq = _converter().convert(
            query="*", extra_arguments={"x-filter": ["otherCore.prefix:field=value"]}, start=1
        )
        assert cq.start == 1
        assert cq.key_col("defaultCore", "otherCore") == "keyDefault"
        assert cq.key_col("otherCore", "defaultCore") == "keyOther"
        assert cq.filter_queries["otherCore"] == [_ast("prefix:field=value")]
        assert cq.queries["defaultCore"] == MatchAllQ()

    def test_filter_query_arg(self):
        cq = _converter().convert(query="*", filter_queries=[("otherCore", "prefix:field=value")])
        assert cq.filter_queries["otherCore"] == [_ast("prefix:field=value")]

    def test_exclude_filter_query_arg(self):
        cq = _converter().convert(
            query="*", exclude_filter_queries=[("otherCore", "prefix:field=value")]
        )
        assert cq.exclude_filter_queries["otherCore"] == [_ast("prefix:field=value")]

    def test_matches_optional(self):
        cq = ConvertToComposedQuery(results_from="defaultCore").convert(
            query="*", extra_arguments={"x-filter": ["prefix:field=value"]}
        )
        # no core prefix → filter lands on the result core
        assert cq.filter_queries["defaultCore"] == [_ast("prefix:field=value")]

    def test_two_x_filters_same_core(self):
        cq = _converter().convert(
            query="*",
            extra_arguments={"x-filter": ["otherCore.prefix:field=value", "otherCore.field2=value2"]},
        )
        assert cq.filter_queries["otherCore"] == [_ast("prefix:field=value"), _ast("field2=value2")]

    def test_dedup_default_on(self):
        cq = _converter().convert(query="*")
        assert cq.dedup_field == "__key__.dedup"
        assert cq.dedup_sort_field == "__key__.date"

    def test_dedup_by_default_false(self):
        cq = _converter(dedup_by_default=False).convert(query="*", extra_arguments={})
        assert cq.dedup_field is None
        cq = _converter(dedup_by_default=False).convert(
            query="*", extra_arguments={"x-filter-common-keys": ["true"]}
        )
        assert cq.dedup_field == "__key__.dedup"

    def test_dedup_turned_off(self):
        cq = _converter().convert(query="*", extra_arguments={"x-filter-common-keys": ["false"]})
        assert cq.dedup_field is None

    def test_dedup_field_param(self):
        cq = _converter().convert(
            query="*", extra_arguments={"x-filter-common-keys-field": ["dedupField"]}
        )
        assert cq.dedup_field == KEY_PREFIX + "dedupField"

    def test_no_dedup_without_field(self):
        cq = _converter(dedup_field_name=None).convert(
            query="*", extra_arguments={"x-filter-common-keys": ["true"]}
        )
        assert cq.dedup_field is None

    def test_rank_query_or_join(self):
        cq = _converter().convert(
            query="*",
            extra_arguments={
                "x-rank-query": [
                    "otherCore.prefix:field=value",
                    "otherCore.otherprefix:otherfield=othervalue",
                    "field=value",
                ]
            },
        )
        assert cq.rank_queries["otherCore"] == _ast(
            "prefix:field=value OR otherprefix:otherfield=othervalue"
        )
        assert cq.rank_queries["defaultCore"] == _ast("field=value")

    def test_clustering(self):
        cq = _converter().convert(query="*", extra_arguments={"x-clustering": ["true"]})
        assert cq.clustering is True
        cq = _converter(clustering_enabled=False).convert(
            query="*", extra_arguments={"x-clustering": ["true"]}
        )
        assert cq.clustering is False

    def test_sort_keys(self):
        cq = _converter().convert(
            query="*",
            sort_keys=[
                dict(sortBy="field", sortDescending=True),
                dict(sortBy="otherCore.field", sortDescending=False),
            ],
        )
        assert cq.sort_keys == [
            ("defaultCore", "field", True),
            ("otherCore", "field", False),
        ]

    def test_ignore_core_prefix_for_result_core(self):
        cq = _converter().convert(query="defaultCore.field=value")
        assert cq.queries["defaultCore"] == _ast("defaultCore.field=value")

    def test_drilldown_queries_and_translate(self):
        cq = _converter().convert(
            query="*",
            drilldown_queries=[("toBePrefixed", ["path1", "path2"]), ("otherCore.toBePrefixed", ["path3"])],
        )
        assert cq.drilldown_queries["defaultCore"] == [("prefix.toBePrefixed", ["path1", "path2"])]
        assert cq.drilldown_queries["otherCore"] == [("prefix.toBePrefixed", ["path3"])]

    def test_facet_core_parse(self):
        cq = _converter().convert(
            query="*",
            facets=[
                {"fieldname": "field", "maxTerms": 5},
                {"fieldname": "otherCore.cat>sub", "maxTerms": 10},
            ],
        )
        assert cq.facets["defaultCore"] == [{"fieldname": "field", "path": [], "max_terms": 5}]
        assert cq.facets["otherCore"] == [{"fieldname": "cat", "path": ["sub"], "max_terms": 10}]

    def test_join_query_to_filters(self):
        cq = _converter().convert(query="field=value AND otherCore.field=value2")
        assert cq.queries["defaultCore"] == _ast("field=value")
        assert cq.filter_queries["otherCore"] == [_ast("field=value2")]

    def test_not_join_query_to_excludes(self):
        cq = _converter().convert(query="field=value NOT otherCore.field=value2")
        assert cq.queries["defaultCore"] == _ast("field=value")
        assert cq.exclude_filter_queries["otherCore"] == [_ast("field=value2")]


def test_frontdoor_end_to_end(ray_session, tmp_path):
    """CQL string → ComposedQuery → MultiSearcher result, vs the manually
    assembled ComposedQuery the round-1 API required."""
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index
    from meresco_lucene_ray.join import ComposedQuery, MultiSearcher
    from meresco_lucene_ray.query import IndexSearcher

    a = pa.table(
        {
            "__id__": [f"a{i}" for i in range(8)],
            "text": [f"alpha common w{i}" for i in range(8)],
            "key": pa.array(list(range(1, 9)), type=pa.int64()),
        }
    )
    b = pa.table(
        {
            "__id__": [f"b{i}" for i in range(6)],
            "text": ["beta"] * 6,
            "key": pa.array([2, 3, 5, 7, 8, 9], type=pa.int64()),
            "flag": ["true", "true", "false", "true", "false", "true"],
        }
    )
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(
        rd.from_arrow(a), da, IndexConfig(text_col="text", id_col="__id__", stored_cols=("key",), num_shards=2)
    )
    build_index(
        rd.from_arrow(b), db, IndexConfig(text_col="text", id_col="__id__", stored_cols=("key", "flag"), num_shards=2)
    )
    ms = MultiSearcher(
        {
            "coreA": IndexSearcher(da, num_actors=1, num_cpus=0.25),
            "coreB": IndexSearcher(db, num_actors=1, num_cpus=0.25),
        },
        16,
    )
    conv = ConvertToComposedQuery(
        results_from="coreA",
        matches=[(("coreA", "key"), ("coreB", "key"))],
        cql_configs={"coreA": CqlConfig(text_col="text", keyword_cols=frozenset({"flag"}), strict=False),
                     "coreB": CqlConfig(text_col="text", keyword_cols=frozenset({"flag"}), strict=False)},
        dedup_by_default=False,
    )
    cq = conv.convert(query="common AND coreB.flag=true")
    res = ms.execute(cq)
    # manual equivalent
    manual = ComposedQuery(result_core="coreA", queries={"coreA": TermQ("common")})
    manual.matches = {("coreA", "coreB"): ("key", "key")}
    manual.filter_queries["coreB"] = [DocValEqQ("flag", "true")]
    expected = ms.execute(manual)
    assert res.ids() == expected.ids()
    assert set(res.ids()) == {"a1", "a2", "a6"}  # flag=true keys 2,3,7 (9 unmatched)


def test_relational_wrapping_in_expression(ray_session, tmp_path):
    """Core-prefixed field with a composed context converts to RelationalQ
    (the RelationalLuceneQuery emission,
    queryexpressiontolucenequerydict.py:147-150) — and, BEYOND the reference
    (its boolean-composition test is @skip), composes inside OR when
    MultiSearcher resolves it to a key bitset."""
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index
    from meresco_lucene_ray.join import ComposedQuery, MultiSearcher
    from meresco_lucene_ray.query import IndexSearcher, RelationalQ, TermQ

    # conversion shape (mirrors testRelationalLuceneQuery)
    cq = ComposedQuery(result_core="thisCore")
    cq.matches = {("thisCore", "otherCore"): ("A", "B")}
    q = expression_to_query(
        cql_to_expression("otherCore.field=value"), CqlConfig(strict=False), composed=cq
    )
    assert q == RelationalQ(
        core="otherCore", collect_key_col="B", filter_key_col="A",
        query=__import__("meresco_lucene_ray.query.ast", fromlist=["DocValEqQ"]).DocValEqQ("field", "value"),
    )

    # end-to-end: 'w1 OR coreB.flag=true' — union of a text match and a
    # cross-core key set
    a = pa.table(
        {
            "__id__": [f"a{i}" for i in range(6)],
            "text": ["w1 x", "zz", "zz", "w1 y", "zz", "zz"],
            "key": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        }
    )
    b = pa.table(
        {
            "__id__": ["b0", "b1", "b2"],
            "text": ["meta"] * 3,
            "key": pa.array([2, 5, 9], type=pa.int64()),
            "flag": ["true", "true", "false"],
        }
    )
    da, db = str(tmp_path / "ra"), str(tmp_path / "rb")
    build_index(rd.from_arrow(a), da, IndexConfig(text_col="text", id_col="__id__", stored_cols=("key",), num_shards=2))
    build_index(rd.from_arrow(b), db, IndexConfig(text_col="text", id_col="__id__", stored_cols=("key", "flag"), num_shards=1))
    ms = MultiSearcher(
        {"coreA": IndexSearcher(da, num_actors=1, num_cpus=0.25),
         "coreB": IndexSearcher(db, num_actors=1, num_cpus=0.25)},
        16,
    )
    cq2 = ComposedQuery(result_core="coreA")
    cq2.matches = {("coreA", "coreB"): ("key", "key")}
    cfg = CqlConfig(text_col="text", keyword_cols=frozenset({"flag"}))
    cq2.queries["coreA"] = expression_to_query(
        cql_to_expression("w1 OR coreB.flag=true"), cfg, composed=cq2
    )
    res = ms.execute(cq2)
    # w1 docs: a0, a3; flag=true keys {2,5} -> a1, a4
    assert set(res.ids()) == {"a0", "a3", "a1", "a4"}
    assert res.total == 4


def test_suggestion_request_pass_through():
    """converttocomposedquery.py:69-72: suggestionRequest rides the kwargs
    straight onto the ComposedQuery."""
    sr = {"suggests": ["dco"], "count": 5, "field": "text", "mode": "SUGGEST_ALWAYS"}
    cq = _converter().convert(query="field=value", suggestion_request=sr)
    assert cq.suggestion_request == sr
    assert _converter().convert(query="field=value").suggestion_request is None


def test_suggestion_request_end_to_end(ray_session, tmp_path):
    """Lucene.java:334-342: a query with a suggestionRequest returns spell
    suggestions per misspelled word alongside its hits, answered from the
    result core's term dictionary."""
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index
    from meresco_lucene_ray.join import MultiSearcher
    from meresco_lucene_ray.query import IndexSearcher

    a = pa.table(
        {
            "__id__": [f"a{i}" for i in range(8)],
            "text": [f"alpha document w{i}" for i in range(7)] + ["alphas document w7"],
            "key": pa.array(list(range(1, 9)), type=pa.int64()),
        }
    )
    da = str(tmp_path / "sa")
    build_index(
        rd.from_arrow(a),
        da,
        IndexConfig(text_col="text", id_col="__id__", stored_cols=("key",), num_shards=2),
    )
    ms = MultiSearcher({"coreA": IndexSearcher(da, num_actors=1, num_cpus=0.25)}, 16)
    conv = ConvertToComposedQuery(
        results_from="coreA",
        cql_configs={"coreA": CqlConfig(text_col="text", strict=False)},
        dedup_by_default=False,
    )
    cq = conv.convert(
        query="alpha",
        suggestion_request={"suggests": ["dcoument", "alpha"], "count": 5},
    )
    res = ms.execute(cq)
    assert res.total == 7
    # 'dcoument' -> 'document' (distance 2, shares first char)
    assert res.suggestions["dcoument"][0][0] == "document"
    # default mode SUGGEST_WHEN_NOT_IN_INDEX: indexed word gets none
    assert res.suggestions["alpha"] == []
    # mode ALWAYS suggests even for indexed words
    cq2 = conv.convert(
        query="alpha",
        suggestion_request={"suggests": ["alpha"], "count": 5, "mode": "SUGGEST_ALWAYS"},
    )
    sug = ms.execute(cq2).suggestions["alpha"]
    assert sug and all(t != "alpha" for t, _, _ in sug)
    # no request -> no suggestions attached
    assert ms.execute(conv.convert(query="alpha")).suggestions is None
