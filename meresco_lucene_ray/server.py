"""Transport-free Lucene server endpoint router — the Java server's HTTP
surface (`src/org/meresco/lucene/http/LuceneHttpServer.java` handlers:
UpdateHandler, QueryHandler, DeleteHandler, CommitHandler, SettingsHandler,
PrefixSearchHandler, NumerateHandler, ExportKeysHandler, the
similarDocuments route, and ComposedQueryHandler) re-expressed over the
``Lucene``/``MultiLucene`` facades, mirrored end-to-end by
``tests/test_server.py`` against ``test/_integration/luceneservertest.py``.

``handle_request(path, Method, Body, **params)`` stands in for the raw
HTTP layer exactly like ``remote_service.py`` does for the remote tier: a
dict with ``statusCode`` / ``contentType`` / ``body`` instead of a socket.
The JSON payloads ARE the reference's wire formats (query dicts via
``query.wireproto``, LuceneResponse via ``query.response_wire``, update
bodies via the ``doc_to_row`` field-list contract, exportkeys via the
exact Lucene FixedBitSet byte layout in ``join.bitsets``).
"""

from __future__ import annotations

import json
import time
import traceback
from typing import Any

from .join.composed import ComposedQuery
from .lucene import ListResponse, Lucene, MultiLucene
from .query.response_wire import response_to_wire
from .state.numerate import TermNumerator

__all__ = ["LuceneServer"]


def _ok(body: str, content_type: str = "application/json") -> dict:
    return {"statusCode": "200", "contentType": content_type, "body": body}


def _error(exc: BaseException) -> dict:
    x = traceback.format_exc()
    return {
        "statusCode": "500",
        "contentType": "text/plain",
        "body": x if x and x.strip() != "None" else repr(exc),
    }


class LuceneServer:
    """Routes ``/<core>/update|query|delete|settings|prefixSearch|
    similarDocuments/`` plus the global ``/commit/``, ``/numerate/`` and
    ``/exportkeys/`` endpoints into the facades."""

    def __init__(self, multi: MultiLucene, numerator: TermNumerator | None = None):
        self._multi = multi
        self._numerator = numerator if numerator is not None else TermNumerator()

    # ---- entry point -----------------------------------------------------
    def handle_request(
        self, path: str, Method: str = "POST", Body: str | bytes | None = None, **params: Any
    ) -> dict:
        try:
            parts = [p for p in path.split("/") if p]
            if parts == ["commit"]:
                for name in self._multi.core_names():
                    self._multi[name].commit()
                return _ok("", "text/plain")
            if parts == ["numerate"]:
                body = Body.decode() if isinstance(Body, bytes) else (Body or "")
                return _ok(str(self._numerator.numerate(body)), "text/plain")
            if parts == ["exportkeys"]:
                return self._exportkeys(Body, **params)
            if parts == ["query"]:  # global composed-query endpoint
                return self._composedquery(Body)
            if len(parts) != 2:
                return {"statusCode": "404", "contentType": "text/plain", "body": "not found"}
            core_name, endpoint = parts
            core = self._multi[core_name]
            handler = getattr(self, "_" + endpoint, None)
            if handler is None:
                return {"statusCode": "404", "contentType": "text/plain", "body": "not found"}
            return handler(core, Method, Body, **params)
        except Exception as e:
            return _error(e)

    # ---- per-core endpoints ----------------------------------------------
    def _update(self, core: Lucene, Method, Body, identifier=None, **_):
        fields = json.loads(Body)
        # TextFields registered in the core's ``text_fields`` keep their own
        # per-field postings (DocumentStringToDocument.java:84-158); only
        # UNREGISTERED TextFields fold into the default text column
        # (doc_to_row joins repeated values with a space, the
        # positionIncrementGap analog).  Typed/facet/key fields keep their
        # own columns and must be in the core's stored_cols to be queried.
        text_col = core._cfg.text_col
        own = {text_col, *core._cfg.text_fields}
        fields = [
            {**f, "name": text_col}
            if f.get("type") == "TextField" and f["name"] not in own
            else f
            for f in fields
        ]
        core.add_document(fields, identifier=identifier)
        return _ok("", "text/plain")

    def _delete(self, core: Lucene, Method, Body, identifier=None, **_):
        if identifier is not None:
            core.delete(identifier=identifier)
        else:
            # same folding as /query/ and /composedquery: a delete naming a
            # folded (unregistered TextField) field must hit the same docs
            # the identical query body matches
            core.delete(lucene_query=self._fold_for(core, json.loads(Body)["query"]))
        return _ok("", "text/plain")

    @staticmethod
    def _fold_for(core: Lucene, q: Any) -> Any:
        """One fold rule for every wire-query entry point (_query, _delete,
        _convert_composed): registered text fields and stored columns pass
        through (wire_to_ast scopes/types them), everything else aliases to
        the core's default text column."""
        return LuceneServer._fold_fields(
            q,
            core._cfg.text_col,
            frozenset(core._cfg.stored_cols) | frozenset(core._cfg.text_fields),
        )

    @staticmethod
    def _fold_fields(q: Any, text_col: str, stored: frozenset) -> Any:
        """The update route folds UNREGISTERED TextFields into the core's
        default tokenized column; queries against those folded field names
        must follow (a field that is neither stored, a registered text
        field, nor ``__id__`` can only mean the text column).  Registered
        ``text_fields`` are in ``stored`` here and pass through untouched —
        wire_to_ast turns them into field-scoped queries."""
        if isinstance(q, dict):
            out = {k: LuceneServer._fold_fields(v, text_col, stored) for k, v in q.items()}
            term = out.get("term")
            if (
                out.get("type") in ("TermQuery", "PrefixQuery", "WildcardQuery")
                and isinstance(term, dict)
                and term.get("type") != "DrillDown"
                and term.get("field") not in stored
                and term.get("field") != "__id__"
            ):
                out["term"] = {**term, "field": text_col}
            return out
        if isinstance(q, list):
            return [LuceneServer._fold_fields(v, text_col, stored) for v in q]
        return q

    def _query(self, core: Lucene, Method, Body, **_):
        d = json.loads(Body)
        if not core._has_index():  # nothing committed yet → empty response
            return _ok(json.dumps({"total": 0, "queryTime": 0, "hits": []}))
        t0 = time.monotonic()
        times: dict[str, int] = {}
        query = self._fold_for(core, d["query"])
        res = core.execute_query(
            lucene_query=query,
            start=d.get("start"),
            stop=d.get("stop"),
            facets=d.get("facets"),
            sort_keys=d.get("sortKeys"),
            suggestion_request=d.get("suggestionRequest"),
            dedup_field=d.get("dedupField"),
            dedup_sort_field=d.get("dedupSortField"),
            clustering=bool(d.get("clustering")),
            stored_fields=d.get("storedFields"),
        )
        ms = int((time.monotonic() - t0) * 1000)
        # the reference reports per-phase times; one engine round serves all
        # phases here, so each requested phase reports the round's time
        times["queryTime"] = ms
        if d.get("facets"):
            times["facetTime"] = ms
        if d.get("suggestionRequest"):
            times["suggestionTime"] = ms
        return _ok(json.dumps(response_to_wire(res, query_time=ms, times=times)))

    def _settings(self, core: Lucene, Method, Body, **_):
        if Method == "GET" or Body in (None, ""):
            d = core.get_settings()
            sim = d.get("similarity")
            if isinstance(sim, dict) and sim.get("type") == "BM25Similarity":
                # the reference GET renders similarity as its display string
                from .query.scorer import BM25

                default = BM25()
                d["similarity"] = "BM25(k1=%s,b=%s)" % (
                    sim.get("k1", default.k1),
                    sim.get("b", default.b),
                )
            return _ok(json.dumps(d))
        core._check_writable("Changing settings")
        core.settings = core.settings.update_settings(Body)
        return _ok("", "text/plain")

    def _prefixSearch(self, core: Lucene, Method, Body, fieldname=None, prefix=None, limit=10, **_):
        res = core.prefix_search(fieldname, prefix, show_count=True, limit=int(limit))
        return _ok(json.dumps([[t, c] for t, c in res.hits]))

    def _similarDocuments(self, core: Lucene, Method, Body, identifier=None, **_):
        try:
            res = core.similar_documents(identifier)
        except (ValueError, KeyError, FileNotFoundError):
            # doc unknown / no stored term vectors → the reference's empty
            # response (luceneservertest.testSimilarDocs)
            return _ok(json.dumps({"total": 0, "queryTime": 0, "hits": []}))
        if isinstance(res, ListResponse):
            return _ok(json.dumps({"total": res.total, "queryTime": 0, "hits": list(res.hits)}))
        return _ok(json.dumps(response_to_wire(res)))

    def _fieldnames(self, core: Lucene, Method, Body, **_):
        return _ok(json.dumps(list(core.fieldnames().hits)))

    def _numDocs(self, core: Lucene, Method, Body, **_):
        return _ok(str(core.num_docs() if core._has_index() else 0), "text/plain")

    def _maxDoc(self, core: Lucene, Method, Body, **_):
        # tombstoned docs stay counted until a merge compacts them — the
        # Lucene maxDoc-vs-numDocs distinction collapses between merges here
        return _ok(str(core.num_docs() if core._has_index() else 0), "text/plain")

    def _drilldownFieldnames(self, core: Lucene, Method, Body, path=None, limit=50, **_):
        res = core.drilldown_fieldnames(path=path, limit=int(limit))
        return _ok(json.dumps(list(res.hits)))

    # ---- composed / export ----------------------------------------------
    def _convert_composed(self, d: dict) -> ComposedQuery:
        """ComposedQuery.fromJsonString + per-core query conversion (the
        reference threads MultiLucene.getQueryConverters() through)."""
        from .query.wireproto import wire_to_ast

        cq = ComposedQuery.from_dict(d)

        def conv(core_name, q):
            if not isinstance(q, dict):
                return q
            core = self._multi[core_name]
            # same fold + WireConfig as the single-core /query/ route: terms
            # naming a registered per-field text column stay field-scoped
            # (they fold into the default column — and lose their per-field
            # postings — if omitted here)
            return wire_to_ast(self._fold_for(core, q), core.wire_config())

        cq.queries = {c: conv(c, q) for c, q in cq.queries.items()}
        cq.filter_queries = {
            c: [conv(c, q) for q in qs] for c, qs in cq.filter_queries.items()
        }
        cq.rank_queries = {c: conv(c, q) for c, q in cq.rank_queries.items()}
        return cq

    def _composedquery(self, Body) -> dict:
        t0 = time.monotonic()
        res = self._multi.execute_composed_query(self._convert_composed(json.loads(Body)))
        ms = int((time.monotonic() - t0) * 1000)
        return _ok(json.dumps(response_to_wire(res, query_time=ms)))

    def _exportkeys(self, Body, exportKey=None, **_):
        cq = self._convert_composed(json.loads(Body))
        cq.export_keys = True
        cq.export_key_name = exportKey
        res = self._multi.execute_composed_query(cq)
        kb = res.drilldown_data["__exported_keys__"]
        return {
            "statusCode": "200",
            "contentType": "application/octet-stream",
            "body": kb.pack_fixed_bitset(),
        }
