"""Mirrors /root/reference/test/suggestionindexcomponenttest.py — the
suggestion front door: update protocol, /suggest records, and the
opensearch handleRequest body/header shaping.  The reference component
POSTs to the Java suggestion server; ours calls the store/reader directly,
so the mocked-transport cases become real end-to-end cases over a tmp
store."""

import json

from meresco_lucene_ray.suggest import SuggestionIndexComponent
from meresco_lucene_ray.suggest.component import CRLF, match


def component(tmp_path):
    sic = SuggestionIndexComponent(str(tmp_path / "sugg"))
    sic.add_suggestions(
        identifier="id:1",
        key=1,
        values=[dict(title="harry", type="uri:book", creator="rowling")],
    )
    sic.add_suggestions(
        identifier="id:2",
        key=2,
        values=[dict(title="hallo", type="uri:book", creator="by:me")],
    )
    sic.create_suggestion_ngram_index()
    return sic


def test_add_and_suggest(tmp_path):  # testAdd + testSuggest
    sic = component(tmp_path)
    suggestions = sic.suggest("ha")
    assert sorted(s.suggestion for s in suggestions) == ["hallo", "harry"]
    by_name = {s.suggestion: s for s in suggestions}
    assert by_name["harry"].type == "uri:book"
    assert by_name["harry"].creator == "rowling"
    assert by_name["hallo"].creator == "by:me"
    assert all(s.score >= 1.0 for s in suggestions)


def test_delete(tmp_path):  # testDelete
    sic = component(tmp_path)
    sic.delete_suggestions("id:1")
    sic.create_suggestion_ngram_index()
    assert [s.suggestion for s in sic.suggest("ha")] == ["hallo"]


def test_create_ngram_index_timestamp(tmp_path):  # testCreateNgramIndex/Timestamp
    sic = component(tmp_path)
    assert sic.ngram_index_timestamp() > 0
    assert sic.indexing_state() is None  # fresh index, nothing stale
    sic.add_suggestions("id:3", 3, values=[dict(title="x y")])
    assert sic.indexing_state() == {"stale": True}


def test_total_shingle_records(tmp_path):  # testTotalShingleRecords analog
    sic = component(tmp_path)
    assert sic.total_shingle_records() == 2


def test_handle_request(tmp_path):  # testHandleRequest
    sic = component(tmp_path)
    header, body = sic.handle_request(
        path="/suggestion", arguments=dict(value=["ha"], minScore=["0"])
    )
    assert header == (
        "HTTP/1.0 200 OK" + CRLF
        + "Content-Type: application/x-suggestions+json" + CRLF
        + "Access-Control-Allow-Origin: *" + CRLF
        + "Access-Control-Allow-Headers: X-Requested-With" + CRLF
        + "Access-Control-Allow-Methods: GET, POST, OPTIONS" + CRLF
        + "Access-Control-Max-Age: 86400" + CRLF
    )
    assert json.loads(body) == ["ha", ["hallo", "harry"]]


def test_handle_request_with_types_and_creators(tmp_path):  # ...WithTypesAndCreators
    sic = component(tmp_path)
    _, body = sic.handle_request(
        path="/suggestion",
        arguments=dict(value=["ha"], minScore=["0"], concepts=["True"]),
    )
    assert json.loads(body) == [
        "ha",
        ["hallo", "harry"],
        [["hallo", "uri:book", "by:me"], ["harry", "uri:book", "rowling"]],
    ]


def test_handle_request_with_debug(tmp_path):  # testHandleRequestWithDebug
    sic = component(tmp_path)
    _, body = sic.handle_request(
        path="/suggestion",
        arguments={"value": ["ha"], "x-debug": ["true"], "minScore": ["0"]},
    )
    d = json.loads(body)
    assert d["value"] == "ha"
    assert "time" in d
    assert [s[0] for s in d["suggestions"]] == ["hallo", "harry"]
    scores = d["suggestions"][0][3]
    assert set(scores) == {"distanceScore", "score", "sortScore", "matchScore"}


def test_handle_request_min_score_filters(tmp_path):
    sic = component(tmp_path)
    _, body = sic.handle_request(
        path="/suggestion", arguments=dict(value=["ha"], minScore=["1000"])
    )
    assert json.loads(body) == ["ha", []]


def test_handle_request_empty_value(tmp_path):  # no value -> empty list body
    sic = component(tmp_path)
    _, body = sic.handle_request(path="/suggestion", arguments={})
    assert json.loads(body) == []


def test_filter_key_set(tmp_path):  # registerFilterKeySet + apikey routing
    sic = component(tmp_path)
    sic.register_filter_key_set("mykeys", {2})
    assert [s.suggestion for s in sic.suggest("ha", key_set_name="mykeys")] == ["hallo"]
    _, body = sic.handle_request(
        path="/suggestion", arguments=dict(value=["ha"], minScore=["0"], apikey=["mykeys"])
    )
    assert json.loads(body) == ["ha", ["hallo"]]


def test_type_filter(tmp_path):  # filters= field=value conjunction
    sic = component(tmp_path)
    sic.add_suggestions("id:9", 9, values=[dict(title="hazel", type="uri:person")])
    sic.create_suggestion_ngram_index()
    got = sic.suggest("ha", filters=["type=uri:book"])
    assert sorted(s.suggestion for s in got) == ["hallo", "harry"]


def test_match_word_containment():  # match() helper (:152-157)
    assert match("ha", "harry") == 1
    assert match("ha ry", "harry") == 2
    assert match("zz", "harry") == 0
