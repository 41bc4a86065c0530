"""Mirrors /root/reference/test/_integration/luceneservertest.py — the Java
server's HTTP endpoint surface, driven transport-free through
``server.LuceneServer`` against real cores: update/query round trip with
the GOLDEN single-doc BM25 score, facets with drilldownData shape,
prefixSearch pairs, suggestionRequest times, settings get/update,
commitCount buffering + explicit /commit/, numerate idempotence,
exportkeys in the exact FixedBitSet wire bytes, similarDocuments'
empty-response fallback."""

import json
import struct

import numpy as np
import pytest

from meresco_lucene_ray.lucene import Lucene, MultiLucene
from meresco_lucene_ray.server import LuceneServer
from meresco_lucene_ray.settings import LuceneSettings


@pytest.fixture()
def make_server(tmp_path, ray_session):
    def make(**core_kw):
        core_kw.setdefault(
            "settings",
            LuceneSettings(
                commit_count=1,
                similarity={"type": "BM25Similarity", "k1": 1.2, "b": 0.75},
            ),
        )
        core = Lucene(str(tmp_path / "coreA"), name="coreA", num_actors=1, **core_kw)
        return LuceneServer(MultiLucene([core], default_core="coreA"))

    return make


@pytest.fixture()
def server(make_server):
    return make_server()


def _update(server, ident, fields):
    resp = server.handle_request(
        "/coreA/update/", "POST", json.dumps(fields), identifier=ident
    )
    assert resp["statusCode"] == "200", resp["body"]
    return resp


def _query(server, **body):
    resp = server.handle_request("/coreA/query/", "POST", json.dumps(body))
    assert resp["statusCode"] == "200", resp["body"]
    return json.loads(resp["body"])


def test_add_and_query_document(server):  # testAddAndQueryDocument
    _update(server, "id1", [{"type": "TextField", "name": "fieldname", "value": "value"}])
    r = _query(server, query={"type": "MatchAllDocsQuery"})
    assert r["total"] == 1
    assert [h["id"] for h in r["hits"]] == ["id1"]
    r = _query(
        server, query={"type": "TermQuery", "term": {"field": "fieldname", "value": "value"}}
    )
    assert r["total"] == 1
    assert "queryTime" in r and "times" in r
    # the reference's golden single-doc BM25 score, byte-exact
    assert r["hits"] == [{"id": "id1", "score": 0.13076457381248474}]


def test_facets(make_server):  # testFacets
    server = make_server(stored_cols=("facetfield",))
    _update(
        server,
        "id1",
        [
            {"type": "TextField", "name": "fieldname", "value": "value"},
            {"type": "FacetField", "name": "facetfield", "path": ["value"]},
        ],
    )
    r = _query(
        server,
        query={"type": "MatchAllDocsQuery"},
        facets=[{"fieldname": "facetfield", "maxTerms": 10}],
    )
    assert r["total"] == 1
    dd = r["drilldownData"]
    for e in dd:
        e.pop("core", None)  # engine envelope carries the core name slot
    assert dd == [
        {"fieldname": "facetfield", "path": [], "terms": [{"term": "value", "count": 1}]}
    ]
    assert "facetTime" in r["times"]


def test_prefix_search(server):  # testPrefixSearch
    _update(
        server,
        "id1",
        [
            {"type": "TextField", "name": "prefixField", "value": "value0"},
            {"type": "TextField", "name": "prefixField", "value": "value1"},
            {"type": "TextField", "name": "prefixField", "value": "value2"},
        ],
    )
    resp = server.handle_request(
        "/coreA/prefixSearch/", "GET", None, fieldname="prefixField", prefix="val"
    )
    assert json.loads(resp["body"]) == [["value0", 1], ["value1", 1], ["value2", 1]]


def test_suggestion_request(server):  # testSuggestionRequest
    _update(server, "id1", [{"type": "TextField", "name": "field", "value": "value"}])
    r = _query(
        server,
        query={"type": "MatchAllDocsQuery"},
        suggestionRequest={"field": "field", "count": 1, "suggests": ["valeu"]},
    )
    assert r["suggestions"] == {"valeu": ["value"]}
    assert "suggestionTime" in r["times"]


def test_settings_get_and_update(server):  # testSettings (+ commitCount update)
    resp = server.handle_request("/coreA/settings/", "GET")
    d = json.loads(resp["body"])
    assert d["commitCount"] == 1
    assert d["commitTimeout"] == 10
    assert d["similarity"] == "BM25(k1=1.2,b=0.75)"  # the reference GET string
    resp = server.handle_request("/coreA/settings/", "POST", json.dumps({"commitCount": 10}))
    assert resp["statusCode"] == "200"
    d2 = json.loads(server.handle_request("/coreA/settings/", "GET")["body"])
    assert d2["commitCount"] == 10


def test_commit_buffers_until_explicit_commit(server):  # testCommit
    server.handle_request("/coreA/settings/", "POST", json.dumps({"commitCount": 10}))
    _update(server, "idCommit", [{"type": "TextField", "name": "fieldname", "value": "value"}])
    r = _query(
        server, query={"type": "TermQuery", "term": {"field": "__id__", "value": "idCommit"}}
    )
    assert r["total"] == 0  # buffered, not yet visible
    resp = server.handle_request("/commit/", "POST")
    assert resp["statusCode"] == "200"
    r = _query(
        server, query={"type": "TermQuery", "term": {"field": "__id__", "value": "idCommit"}}
    )
    assert r["total"] == 1


def test_numerate(server):  # testNumerate
    a = server.handle_request("/numerate/", "POST", "id0")["body"]
    b = server.handle_request("/numerate/", "POST", "id0")["body"]
    c = server.handle_request("/numerate/", "POST", "id1")["body"]
    assert a == b and a != c


def test_exportkeys_fixed_bitset(make_server):  # testExportKeys
    server = make_server(stored_cols=("__key__.field",))
    for i in range(3, 101):
        _update(
            server,
            f"id{i}",
            [
                {"type": "TextField", "name": "field", "value": "value"},
                {"type": "KeyField", "name": "__key__.field", "value": i},
            ],
        )
    cq = {
        "resultsFrom": "coreA",
        "cores": ["coreA"],
        "queries": {"coreA": {"type": "MatchAllDocsQuery"}},
    }
    resp = server.handle_request(
        "/exportkeys/", "POST", json.dumps(cq), exportKey="__key__.field"
    )
    assert resp["statusCode"] == "200", resp["body"]
    data = resp["body"]
    num_bits, num_words = struct.unpack(">ii", data[:8])
    longs = [
        struct.unpack(">q", data[8 + i * 8 : 16 + i * 8])[0] for i in range(num_words)
    ]

    def bit(i):
        return bool((longs[i >> 6] >> (i & 63)) & 1)

    for i in range(0, 102):
        assert bit(i) == (2 < i < 101), i


def test_similar_documents_empty_fallback(server):  # testSimilarDocs
    resp = server.handle_request(
        "/coreA/similarDocuments/", "POST", "", identifier="id1"
    )
    assert json.loads(resp["body"]) == {"total": 0, "queryTime": 0, "hits": []}


def test_unknown_routes(server):
    assert server.handle_request("/nope/", "GET")["statusCode"] == "404"
    assert server.handle_request("/coreA/nope/", "GET")["statusCode"] == "404"


def test_composed_query_endpoint(tmp_path, ray_session):
    """The global /query/ endpoint (ComposedQueryHandler): a two-core
    semi-join posted as the reference's composedQuery JSON."""
    settings = LuceneSettings(commit_count=1)
    a = Lucene(str(tmp_path / "A"), name="coreA", settings=settings, num_actors=1,
               stored_cols=("keyA",))
    b = Lucene(str(tmp_path / "B"), name="coreB", settings=settings, num_actors=1,
               stored_cols=("keyB",))
    server = LuceneServer(MultiLucene([a, b], default_core="coreA"))
    for i, word in enumerate(["apple", "apple", "banana"]):
        resp = server.handle_request(
            "/coreA/update/", "POST",
            json.dumps([
                {"type": "TextField", "name": "f", "value": word},
                {"type": "KeyField", "name": "keyA", "value": i},
            ]),
            identifier=f"a{i}",
        )
        assert resp["statusCode"] == "200", resp["body"]
    for i, word in enumerate(["match", "miss", "match"]):
        resp = server.handle_request(
            "/coreB/update/", "POST",
            json.dumps([
                {"type": "TextField", "name": "g", "value": word},
                {"type": "KeyField", "name": "keyB", "value": i},
            ]),
            identifier=f"b{i}",
        )
        assert resp["statusCode"] == "200", resp["body"]
    cq = {
        "resultsFrom": "coreA",
        "cores": ["coreA", "coreB"],
        "queries": {
            "coreA": {"type": "MatchAllDocsQuery"},
            "coreB": {"type": "TermQuery", "term": {"field": "g", "value": "match"}},
        },
        "_matches": {
            "coreA->coreB": [
                {"core": "coreA", "uniqueKey": "keyA"},
                {"core": "coreB", "key": "keyB"},
            ]
        },
    }
    resp = server.handle_request("/query/", "POST", json.dumps(cq))
    assert resp["statusCode"] == "200", resp["body"]
    r = json.loads(resp["body"])
    # coreB docs b0 (key 0) and b2 (key 2) match → coreA docs a0, a2 survive
    assert r["total"] == 2
    assert sorted(h["id"] for h in r["hits"]) == ["a0", "a2"]


def test_composed_query_field_scoped_text_term(tmp_path, ray_session):
    """Composed-query conversion threads each core's WireConfig: a term
    naming a registered per-field text column stays field-scoped instead of
    folding into the default text column (same contract as /coreX/query/)."""
    settings = LuceneSettings(commit_count=1)
    a = Lucene(str(tmp_path / "A"), name="coreA", settings=settings, num_actors=1,
               stored_cols=("keyA",), text_fields=("title",))
    b = Lucene(str(tmp_path / "B"), name="coreB", settings=settings, num_actors=1,
               stored_cols=("keyB",))
    server = LuceneServer(MultiLucene([a, b], default_core="coreA"))
    docs = [("apple", "apple"), ("apple banana", "pear"), ("cherry", "apple")]
    for i, (content, title) in enumerate(docs):
        resp = server.handle_request(
            "/coreA/update/", "POST",
            json.dumps([
                {"type": "TextField", "name": "content", "value": content},
                {"type": "TextField", "name": "title", "value": title},
                {"type": "KeyField", "name": "keyA", "value": i},
            ]),
            identifier=f"a{i}",
        )
        assert resp["statusCode"] == "200", resp["body"]
    for i in range(3):
        resp = server.handle_request(
            "/coreB/update/", "POST",
            json.dumps([
                {"type": "TextField", "name": "g", "value": "match"},
                {"type": "KeyField", "name": "keyB", "value": i},
            ]),
            identifier=f"b{i}",
        )
        assert resp["statusCode"] == "200", resp["body"]
    cq = {
        "resultsFrom": "coreA",
        "cores": ["coreA", "coreB"],
        "queries": {
            "coreA": {"type": "TermQuery", "term": {"field": "title", "value": "apple"}},
            "coreB": {"type": "MatchAllDocsQuery"},
        },
        "_matches": {
            "coreA->coreB": [
                {"core": "coreA", "uniqueKey": "keyA"},
                {"core": "coreB", "key": "keyB"},
            ]
        },
    }
    resp = server.handle_request("/query/", "POST", json.dumps(cq))
    assert resp["statusCode"] == "200", resp["body"]
    r = json.loads(resp["body"])
    # title-scoped: a0 and a2 ('apple' in title) — NOT a1 ('apple' only in
    # content, which a fold-into-default conversion would wrongly match)
    assert r["total"] == 2
    assert sorted(h["id"] for h in r["hits"]) == ["a0", "a2"]


def test_delete_by_query_folded_field(server):
    """Delete-by-query folds unregistered TextField names into the default
    text column exactly like /query/ does — the identical body must match
    the same docs on both routes (the update route folded 'author' terms
    into the default column at index time)."""
    for ident, author in [("d1", "smith"), ("d2", "jones"), ("d3", "smith")]:
        _update(server, ident, [{"type": "TextField", "name": "author", "value": author}])
    body = {"type": "TermQuery", "term": {"field": "author", "value": "smith"}}
    r = _query(server, query=body)
    assert r["total"] == 2
    resp = server.handle_request("/coreA/delete/", "POST", json.dumps({"query": body}))
    assert resp["statusCode"] == "200", resp["body"]
    server.handle_request("/commit/", "POST")
    r = _query(server, query={"type": "MatchAllDocsQuery"})
    assert r["total"] == 1
    assert [h["id"] for h in r["hits"]] == ["d2"]
