"""Mirrors /root/reference/test/composedquerytest.py — the ComposedQuery
builder / validation / wire-serialization surface (snake_case ports of the
camelCase methods).

Adaptations: our engine defaults ``start=0, stop=10`` (the reference leaves
both None until assigned); sort keys store engine-native ``(core, field,
desc)`` tuples, round-tripped through the reference's dict shape.
"""

import pytest

from meresco_lucene_ray.join.composed import ComposedQuery, Unite


def test_validate_composed_query():  # testValidateComposedQuery
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.set_core_query(core="coreB", query="Q1")
    with pytest.raises(ValueError, match=r"No match set for cores \('coreA', 'coreB'\)"):
        cq.validate()

    cq = ComposedQuery("coreA", query="A")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.validate()
    assert cq.number_of_used_cores == 1


def test_validate_for_three_cores():  # testValidateComposedQueryForThreeCores
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.set_core_query(core="coreB", query="Q1")
    with pytest.raises(ValueError, match=r"No match set for cores \('coreA', 'coreB'\)"):
        cq.validate()
    cq.set_core_query(core="coreC", query="Q2")

    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    with pytest.raises(ValueError, match=r"No match set for cores \('coreA', 'coreC'\)"):
        cq.validate()

    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreC", key="keyC"))
    cq.validate()
    assert cq.number_of_used_cores == 3


def test_validate_invalid_json():  # testValidateComposedQueryForInvalidJson
    cq = ComposedQuery("coreA", query="Q0")
    cq.relational_filter_json = "not JSON"
    with pytest.raises(
        ValueError,
        match=r"Value 'not JSON' for 'relationalFilterJson' can not be parsed as JSON\.",
    ):
        cq.validate()
    cq.relational_filter_json = '{"type": "MockJoinQuery"}'
    cq.validate()


def test_result_core_match_needs_unique_key():  # testSameCoreInDifferentMatches...
    cq = ComposedQuery("coreA", query="qA")
    cq.set_core_query("coreB", query="qB")
    cq.set_core_query("coreC", query="qC")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    with pytest.raises(ValueError):
        cq.add_match(dict(core="coreA", key="keyX"), dict(core="coreC", key="keyC"))


def test_at_most_one_unite():  # testAtMostOneMultiCoreOr
    cq = ComposedQuery("coreA")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreC", key="keyC"))
    cq.add_unite(dict(core="coreA", query="qA"), dict(core="coreB", query="qB"))
    with pytest.raises(ValueError, match="No more than 1 addUnite supported"):
        cq.add_unite(dict(core="coreA", query="qA"), dict(core="coreC", query="qC"))


def test_unique_key_doesnt_match_results_from():  # testUniqueKeyDoesntMatchResultsFrom
    cq = ComposedQuery("coreA", query="A").set_core_query("coreB", query="bQ")
    with pytest.raises(ValueError):
        cq.add_match(dict(core="coreA", key="keyA"), dict(core="coreB", key="keyB"))
    with pytest.raises(ValueError):
        cq.add_match(dict(core="coreA", key="keyA"), dict(core="coreB", uniqueKey="keyB"))
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.validate()
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", uniqueKey="keyB"))
    cq.validate()


def test_matches_must_include_results_from():  # testMatchesMustAlwaysIncludeResultsFrom
    cq = ComposedQuery("coreA", query="qA")
    cq.set_core_query("coreB", query="qB")
    cq.set_core_query("coreC", query="qC")
    with pytest.raises(ValueError, match="not include resultsFromCore"):
        cq.add_match(dict(core="coreB", key="keyB"), dict(core="coreC", key="keyC"))


def test_key_name():  # testKeyName
    cq = ComposedQuery("coreA")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_facet(core="coreB", facet="F0")
    assert cq.key_name("coreA", "coreB") == "keyA"
    assert cq.key_name("coreB", "coreA") == "keyB"
    assert cq.key_names("coreA") == {"keyA"}


def test_key_names_differ_per_core():  # testKeyNamesDifferPerCore
    cq = ComposedQuery("coreA")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_match(dict(core="coreA", uniqueKey="keyAC"), dict(core="coreC", key="keyC"))
    cq.add_facet(core="coreB", facet="F0")
    cq.add_facet(core="coreC", facet="F1")
    assert cq.key_name("coreA", "coreC") == "keyAC"
    assert cq.key_name("coreC", "coreA") == "keyC"
    assert cq.key_names("coreA") == {"keyA", "keyAC"}


def test_unite():  # testUnite
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query=None)
    cq.set_core_query(core="coreB", query=None)
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_unite(dict(core="coreA", query="AQuery"), dict(core="coreB", query="anotherQuery"))
    assert len(cq.unites) == 1
    queries = list(cq.unites[0].queries())
    assert queries[0] == ({"query": "AQuery", "keyName": "keyA", "core": "coreA"}, "keyA")
    assert queries[1] == (
        {"query": "anotherQuery", "keyName": "keyB", "core": "coreB"},
        "keyA",
    )
    # the engine's tuple-pair unpacking accepts the Unite object
    (ca, qa), (cb, qb) = cq.unites[0]
    assert (ca, qa, cb, qb) == ("coreA", "AQuery", "coreB", "anotherQuery")


def test_filter_queries():  # testFilterQueries
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.add_filter_query(core="coreA", query="Q1")
    cq.add_filter_query(core="coreA", query="Q2")
    cq.add_facet(core="coreA", facet="F0")
    cq.add_facet(core="coreA", facet="F1")
    cq.set_core_query(core="coreB", query="Q3")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_unite(dict(core="coreA", query="AQuery"), dict(core="coreB", query="anotherQuery"))
    assert cq.sort_keys == []
    cq.stop = 10
    cq.start = 0
    cq.add_sort_key(dict(sortBy="field", sortDescending=True))
    assert cq.query_for("coreA") == "Q0"
    assert cq.filter_queries_for("coreA") == ["Q1", "Q2"]
    assert cq.facets_for("coreA") == ["F0", "F1"]
    assert cq.stop == 10
    assert cq.start == 0
    assert cq.sort_keys == [("coreA", "field", True)]


def test_as_dict_from_dict():  # testAsDictFromDict
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.add_filter_query(core="coreA", query="Q1")
    cq.add_filter_query(core="coreA", query="Q2")
    cq.relational_filter_json = '{"type": "madeUpJoinQuery"}'
    cq.add_facet(core="coreA", facet="F0")
    cq.add_facet(core="coreA", facet="F1")
    cq.set_core_query(core="coreB", query="Q3")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_unite(dict(core="coreA", query="AQuery"), dict(core="coreB", query="anotherQuery"))
    cq.start = 0
    cq.add_sort_key(dict(sortBy="field", sortDescending=True))
    cq.clustering = True
    cq.cluster_config = {"clusteringEps": 0.2}
    cq.rank_ratio = 0.75

    import json

    d = json.loads(json.dumps(cq.as_dict()))  # must survive real JSON
    cq2 = ComposedQuery.from_dict(d)
    assert cq2.result_core == "coreA"
    assert cq2.start == 0
    assert cq2.queries_for("coreA") == ["Q0", "Q1", "Q2"]
    assert cq2.relational_filter_json == '{"type": "madeUpJoinQuery"}'
    assert cq2.facets_for("coreA") == ["F0", "F1"]
    assert cq2.key_name("coreA", "coreB") == "keyA"
    assert cq2.key_name("coreB", "coreA") == "keyB"
    assert len(cq2.unites) == 1
    queries = list(cq2.unites[0].queries())
    assert queries[0] == ({"core": "coreA", "keyName": "keyA", "query": "AQuery"}, "keyA")
    assert queries[1] == (
        {"core": "coreB", "keyName": "keyB", "query": "anotherQuery"},
        "keyA",
    )
    assert cq2.cluster_config == {"clusteringEps": 0.2}
    assert cq2.rank_ratio == 0.75
    assert cq2.sort_keys == [("coreA", "field", True)]
    # uniqueKey-vs-key distinction survives the round-trip
    assert cq2.match_specs[("coreA", "coreB")][0] == {"core": "coreA", "uniqueKey": "keyA"}


def test_add_filter_queries_incremental():  # testAddFilterQueriesIncremental
    cq = ComposedQuery("coreA")
    cq.add_filter_query(core="coreA", query="Q1")
    cq.add_filter_query(core="coreA", query="Q2")
    assert cq.filter_queries_for("coreA") == ["Q1", "Q2"]


def test_add_facet_incremental():  # testAddFacetIncremental
    cq = ComposedQuery("coreA")
    cq.add_facet(core="coreA", facet=dict(fieldname="Q1", maxTerms=10))
    cq.add_facet(core="coreA", facet=dict(fieldname="Q2", maxTerms=10))
    assert cq.facets_for("coreA") == [
        dict(fieldname="Q1", maxTerms=10),
        dict(fieldname="Q2", maxTerms=10),
    ]


def test_convert_all_queries():  # testConvertAllQueries
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.add_filter_query("coreA", "Q1")
    cq.add_filter_query("coreA", "Q2")
    cq.set_core_query(core="coreB", query="Q3")
    cq.add_filter_query("coreB", "Q4")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_unite(dict(core="coreA", query="Q5"), dict(core="coreB", query="Q6"))
    cq.convert_with(
        coreA=lambda query, **kwargs: f"Converted_A_{query}",
        coreB=lambda query, **kwargs: f"Converted_B_{query}",
    )
    assert cq.query_for("coreA") == "Converted_A_Q0"
    assert cq.filter_queries_for("coreA") == ["Converted_A_Q1", "Converted_A_Q2"]
    assert cq.query_for("coreB") == "Converted_B_Q3"
    assert cq.filter_queries_for("coreB") == ["Converted_B_Q4"]
    queries = list(cq.unites[0].queries())
    assert queries[0][0]["query"] == "Converted_A_Q5"
    assert queries[1][0]["query"] == "Converted_B_Q6"


def test_convert_with_unqualified_term_fields():  # testConvertAllQueriesWithUnqualifiedTermFields
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.add_filter_query("coreA", "Q1")
    cq.add_filter_query("coreA", "Q2")
    cq.set_core_query(core="coreB", query="Q3")
    cq.add_filter_query("coreB", "Q4")
    cq.add_match(dict(core="coreA", uniqueKey="keyA"), dict(core="coreB", key="keyB"))
    cq.add_unite(dict(core="coreA", query="Q5"), dict(core="coreB", query="Q6"))
    cq.unqualified_term_fields = [("field0", 2.0), ("field1", 3.0)]
    cq.convert_with(
        coreA=lambda query, unqualifiedTermFields=None, **kwargs: "Converted_A_{0}_{1}".format(
            query, unqualifiedTermFields is not None
        ),
        coreB=lambda query, **kwargs: f"Converted_B_{query}",
    )
    assert cq.query_for("coreA") == "Converted_A_Q0_True"
    assert cq.filter_queries_for("coreA") == ["Converted_A_Q1_True", "Converted_A_Q2_True"]
    assert cq.query_for("coreB") == "Converted_B_Q3"
    assert cq.filter_queries_for("coreB") == ["Converted_B_Q4"]
    unite_queries = list(cq.unites[0].queries())
    assert unite_queries[0][0]["query"] == "Converted_A_Q5_True"
    assert unite_queries[1][0]["query"] == "Converted_B_Q6"


def test_single_core_query():  # testSingleCoreQuery
    cq = ComposedQuery("coreA")
    cq.set_core_query(core="coreA", query="Q0")
    cq.validate()
    assert cq.number_of_used_cores == 1
    assert cq.is_single_core_query()
