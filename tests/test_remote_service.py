"""Mirrors /root/reference/test/luceneremotetest.py — the remote tier:
``LuceneRemoteService`` (decode → allowed-method gate → dispatch → encode)
and ``SynchronousRemote`` (the client surface, positional-query and
cqlAbstractSyntaxTree aliases, 200-verification).  The reference mocks the
HTTP transport with CallTrace; ours round-trips the same Conversion /
LuceneResponse payloads through a loopback transport into a REAL index."""

import json

import pytest

from meresco_lucene_ray.adapter import QueryExpressionConverter
from meresco_lucene_ray.docwire import add_string_fields, add_text_fields
from meresco_lucene_ray.lucene import Lucene, MultiLucene
from meresco_lucene_ray.remote import Conversion, ParsedCql
from meresco_lucene_ray.remote_service import (
    LuceneRemoteService,
    RemoteError,
    SynchronousRemote,
)


@pytest.fixture(scope="module")
def service(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("remote")
    core = Lucene(str(tmp / "coreA"), name="coreA", stored_cols=("tag",), num_actors=1)
    for ident, text, tag in [
        ("id:0", "alpha beta", "x"),
        ("id:1", "beta gamma", "y"),
        ("id:2", "gamma delta", "y"),
    ]:
        fields = []
        add_text_fields(fields, ("",), 0, "content", text)
        add_string_fields(fields, ("",), 0, "tag", tag)
        core.add_document(fields, identifier=ident)
    core.commit()
    ml = MultiLucene([core], default_core="coreA")
    conv = QueryExpressionConverter(unqualified_term_fields=[("content", 1.0)])
    return LuceneRemoteService(ml, converters={"coreA": conv}, default_core="coreA")


@pytest.fixture()
def remote(service):
    return SynchronousRemote(service=service, path="/path")


# ---- service side ----------------------------------------------------------


def test_service_execute_query_envelope(service):
    # raw wire body, __CQL_QUERY__-tagged query, like testServiceExecuteQuery
    body = json.dumps(
        {
            "message": "executeQuery",
            "kwargs": {
                "query": {"__CQL_QUERY__": json.dumps("beta")},
                "start": 0,
                "stop": 10,
            },
        }
    )
    resp = service.handle_request("/__lucene_remote__", "POST", body)
    assert resp["statusCode"] == "200"
    assert resp["contentType"] == "application/json"
    d = json.loads(resp["body"])
    assert d["total"] == 2
    assert sorted(h["id"] for h in d["hits"]) == ["id:0", "id:1"]


def test_service_filter_queries(service):
    body = Conversion().json_dump_message(
        "executeQuery",
        query=ParsedCql.parse("beta OR gamma"),
        filterQueries=[ParsedCql.parse("tag exact y")],
    )
    resp = service.handle_request("/__lucene_remote__", "POST", body)
    d = json.loads(resp["body"])
    assert d["total"] == 2  # id:1, id:2 (tag=y), id:0 filtered out
    assert sorted(h["id"] for h in d["hits"]) == ["id:1", "id:2"]


def test_service_rejects_unknown_message(service):
    # testDeclineOtherMessages (server side): same "Expected ..." error text
    body = json.dumps({"message": "aMessage", "kwargs": {}})
    resp = service.handle_request("/__lucene_remote__", "POST", body)
    assert resp["statusCode"] == "500"
    assert 'Expected "executeQuery" or "prefixSearch"' in resp["body"]


def test_service_version_endpoint(service):
    resp = service.handle_request("/info/version", "GET")
    assert resp["statusCode"] == "200"
    assert resp["body"].startswith("Meresco Lucene version")


def test_service_unknown_path(service):
    assert service.handle_request("/nope", "GET")["statusCode"] == "404"


# ---- client surface --------------------------------------------------------


def test_remote_execute_query(remote):
    res = remote.executeQuery(ParsedCql.parse("beta"))
    assert res.total == 2
    assert sorted(res.ids()) == ["id:0", "id:1"]


def test_remote_cql_ast_alias(remote):  # SynchronousRemote.executeQuery alias
    res = remote.executeQuery(cqlAbstractSyntaxTree=ParsedCql.parse("delta"))
    assert res.total == 1
    assert res.ids() == ["id:2"]


def test_remote_prefix_search(remote):  # testRemotePrefixSearch
    res = remote.prefixSearch(fieldname="content", prefix="ga", show_count=True)
    assert res.hits == [("gamma", 2)]
    res2 = remote.prefixSearch(fieldname="content", prefix="ga")
    assert res2.hits == ["gamma"]


def test_remote_fieldnames(remote):  # testRemoteFieldnames
    res = remote.fieldnames()
    assert "content" in res.hits


def test_remote_similar_documents(remote):
    res = remote.similarDocuments(identifier="id:0", text="alpha beta")
    assert res.total >= 1


def test_remote_error_status(service):
    # a transport yielding non-200 raises the reference's IOError text
    def bad_transport(path, method, body):
        return {"statusCode": "500", "contentType": "text/plain", "body": "boom"}

    remote = SynchronousRemote(transport=bad_transport)
    with pytest.raises(RemoteError, match="Expected status '200'"):
        remote.executeQuery(ParsedCql.parse("beta"))


def test_wire_envelope_shape(service):
    # the posted body IS the reference envelope: {"message", "kwargs"} with
    # tagged objects (testRemoteExecuteQuery's body assertions)
    captured = {}

    def spy(path, method, body):
        captured["path"], captured["body"] = path, body
        return service.handle_request("/__lucene_remote__", method, body)

    remote = SynchronousRemote(transport=spy, path="/path")
    remote.executeQuery(ParsedCql.parse("beta"), start=0, stop=5)
    assert captured["path"] == "/path/__lucene_remote__"
    message, kwargs = Conversion().json_load_message(captured["body"])
    assert message == "executeQuery"
    assert kwargs["start"] == 0 and kwargs["stop"] == 5
    assert isinstance(kwargs["query"], ParsedCql)
