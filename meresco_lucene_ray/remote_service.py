"""Loopback remote service + synchronous client — the reference's remote
tier without the HTTP socket layer.

Re-expresses (transport-free; the reference's Jetty/weightless sockets are
deployment plumbing a Ray-native engine replaces with actors):

- ``meresco/lucene/remote/_service.py:53-119`` (``LuceneRemoteService``):
  the ``POST …/__lucene_remote__`` endpoint — Conversion envelope decode,
  the allowed-method gate with the same error message, dispatch into the
  backend, ``LuceneResponse``-JSON encode, tracebacks as a 500 plain-text
  body — plus the ``/info/version`` string endpoint.
- ``meresco/lucene/remote/_remote.py:42-76`` + ``synchronousremote.py:37-64``
  (``LuceneRemote`` / ``SynchronousRemote``): the client call surface —
  the same six methods, ``executeQuery``'s positional-query and
  ``cqlAbstractSyntaxTree`` aliases, the "Expected status '200'" IOError —
  round-tripping every call through the REAL wire encoding (Conversion
  request envelope out, LuceneResponse JSON back in), so a test driving
  ``SynchronousRemote`` exercises byte-identical payloads to the reference's
  HTTP deployment.

The backend is anything with the ``MultiLucene`` call surface
(`lucene.py`); per-core ``QueryExpressionConverter``s translate incoming
``QueryExpression`` / ``ParsedCql`` payloads into engine ASTs (the role the
observable ``AdapterToLuceneQuery`` plays in the reference stack).
"""

from __future__ import annotations

import json
import traceback
from typing import Any, Callable

from .adapter import QueryExpressionConverter
from .cql import QueryExpression
from .lucene import ListResponse
from .query.engine import SearchResult
from .query.response_wire import response_from_wire, response_to_wire
from .remote import Conversion, ParsedCql

__all__ = ["LuceneRemoteService", "SynchronousRemote", "RemoteError"]

ALLOWED_METHODS = (
    "executeQuery",
    "prefixSearch",
    "fieldnames",
    "drilldownFieldnames",
    "executeComposedQuery",
    "similarDocuments",
)

VERSION = "ray-0.3"


class RemoteError(IOError):
    """Server-side failure surfaced to the client (the reference raises
    plain IOError from ``_verify200``)."""


def _snake_kwargs(kwargs: dict[str, Any]) -> dict[str, Any]:
    """CamelCase wire kwargs → the facade's snake_case protocol."""
    ren = {
        "luceneQuery": "lucene_query",
        "sortKeys": "sort_keys",
        "suggestionRequest": "suggestion_request",
        "dedupField": "dedup_field",
        "dedupSortField": "dedup_sort_field",
        "storedFields": "stored_fields",
        "showCount": "show_count",
    }
    return {ren.get(k, k): v for k, v in kwargs.items()}


class LuceneRemoteService:
    """``LuceneRemoteService`` analog: decode → gate → dispatch → encode.

    ``handle_request`` mirrors ``handleRequest`` (:92-99): a dict with
    ``statusCode`` / ``contentType`` / ``body`` stands in for the raw HTTP
    byte stream."""

    def __init__(
        self,
        backend,
        conversion: Conversion | None = None,
        converters: dict[str, QueryExpressionConverter] | None = None,
        default_core: str | None = None,
    ):
        self._backend = backend
        self._conversion = Conversion() if conversion is None else conversion
        self._converters = dict(converters or {})
        self._default_core = default_core

    # ---- server side -----------------------------------------------------
    def handle_request(self, path: str, Method: str = "POST", Body: str | None = None) -> dict:
        if Method == "POST" and path.endswith("/__lucene_remote__"):
            return self._handle_query(Body or "")
        if "/info" in path and path.rstrip("/").endswith("version"):
            return {
                "statusCode": "200",
                "contentType": "text/plain",
                "body": f"Meresco Lucene version {VERSION}",
            }
        return {"statusCode": "404", "contentType": "text/plain", "body": "not found"}

    def _handle_query(self, body: str) -> dict:
        try:
            message, kwargs = self._conversion.json_load_message(body)
            if message not in ALLOWED_METHODS:
                raise ValueError(
                    "Expected %s" % " or ".join('"%s"' % m for m in ALLOWED_METHODS)
                )
            response = self._dispatch(message, kwargs)
        except Exception as e:  # _handleQuery's server-error path (:101-107)
            x = traceback.format_exc()
            return {
                "statusCode": "500",
                "contentType": "text/plain",
                "body": x if x and x.strip() != "None" else repr(e),
            }
        return {
            "statusCode": "200",
            "contentType": "application/json",
            "body": self._encode(response),
        }

    def _dispatch(self, message: str, kwargs: dict[str, Any]):
        kwargs = _snake_kwargs(kwargs)
        core = kwargs.pop("core", None) or self._default_core
        b = self._backend
        if message == "executeQuery":
            q = kwargs.pop("query", None)
            if q is None:
                q = kwargs.pop("cqlAbstractSyntaxTree", None)
            if q is None:
                q = kwargs.pop("lucene_query")
            q = self._to_engine_query(q, core)
            fqs = kwargs.pop("filterQueries", None)
            if fqs:  # Lucene.executeQuery's filterQueries: AND as non-scoring
                from .query.ast import BoolQ

                q = BoolQ(
                    must=(q,),
                    filter=tuple(self._to_engine_query(f, core) for f in fqs),
                )
            kwargs["lucene_query"] = q
            return b.execute_query(core=core, **kwargs)
        if message == "executeComposedQuery":
            return b.execute_composed_query(kwargs["query"])
        if message == "prefixSearch":
            return b.prefix_search(core=core, **kwargs)
        if message == "fieldnames":
            return b.fieldnames(core=core)
        if message == "drilldownFieldnames":
            return b.drilldown_fieldnames(core=core, **kwargs)
        if message == "similarDocuments":
            return b.similar_documents(core=core, **kwargs)
        raise ValueError(message)

    def _to_engine_query(self, q: Any, core: str | None):
        if isinstance(q, ParsedCql):
            q = q.expression
        if isinstance(q, (QueryExpression, str)):
            conv = self._converters.get(core) if core else None
            if conv is None:
                conv = self._converters.setdefault(core, QueryExpressionConverter())
            return conv.convert(q)
        return q  # engine AST or JSON wire dict: execute_query handles both

    @staticmethod
    def _encode(response) -> str:
        if isinstance(response, SearchResult):
            return json.dumps(response_to_wire(response))
        if isinstance(response, ListResponse):
            hits = [list(h) if isinstance(h, tuple) else h for h in response.hits]
            return json.dumps({"total": int(response.total), "hits": hits})
        return json.dumps(response)


class SynchronousRemote:
    """``SynchronousRemote`` analog over a loopback (or any callable)
    transport: each call wire-encodes with Conversion, posts to the
    service, verifies 200, and parses the LuceneResponse JSON."""

    def __init__(
        self,
        service: LuceneRemoteService | None = None,
        path: str = "",
        conversion: Conversion | None = None,
        transport: Callable[[str, str, str], dict] | None = None,
    ):
        if transport is None:
            if service is None:
                raise ValueError("need a service or a transport")
            transport = service.handle_request
        self._transport = transport
        self._path = path + "/__lucene_remote__"
        self._conversion = Conversion() if conversion is None else conversion

    # client surface (synchronousremote.py:44-64)
    def prefixSearch(self, **kwargs):
        return self._send_list("prefixSearch", **kwargs)

    def fieldnames(self, **kwargs):
        return self._send_list("fieldnames", **kwargs)

    def drilldownFieldnames(self, **kwargs):
        return self._send_list("drilldownFieldnames", **kwargs)

    def similarDocuments(self, **kwargs):
        return self._send_query("similarDocuments", **kwargs)

    def executeQuery(self, *args, **kwargs):
        if len(args) == 1:
            kwargs["query"] = args[0]
        if "cqlAbstractSyntaxTree" in kwargs:
            kwargs["query"] = kwargs.pop("cqlAbstractSyntaxTree")
        return self._send_query("executeQuery", **kwargs)

    def executeComposedQuery(self, *args, **kwargs):
        if len(args) == 1:
            kwargs["query"] = args[0]
        return self._send_query("executeComposedQuery", **kwargs)

    # ---- wire round trip -------------------------------------------------
    def _post(self, message: str, kwargs: dict) -> str:
        body = self._conversion.json_dump_message(message, **kwargs)
        resp = self._transport(self._path, "POST", body)
        if resp["statusCode"] != "200":
            raise RemoteError(
                "Expected status '200' from LuceneRemoteService, but got: "
                + str(resp["body"])
            )
        return resp["body"]

    def _send_query(self, message: str, **kwargs) -> SearchResult:
        return response_from_wire(self._post(message, kwargs))

    def _send_list(self, message: str, **kwargs) -> ListResponse:
        d = json.loads(self._post(message, kwargs))
        hits = [tuple(h) if isinstance(h, list) else h for h in d.get("hits", [])]
        return ListResponse(total=int(d.get("total", 0)), hits=hits)
