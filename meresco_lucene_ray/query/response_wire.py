"""LuceneResponse JSON wire format ⇄ SearchResult.

The reference returns query results as the LuceneResponse JSON the Python
tier parses (``src/org/meresco/lucene/LuceneResponse.java:159-272``
``toJson``; ``meresco/lucene/_lucene.py`` consumes it;
``LuceneResponseToJsonTest.java`` pins the shapes):

``{"total": N, "queryTime": ms, "hits": [{"id": ..., "score": ...,
<stored field>: [values...], "duplicateCount": {field: n},
"duplicates": {"topDocs": [...], "topTerms": [...]}}],
"totalWithDuplicates": N?, "drilldownData": [{"fieldname", "core", "path",
"terms": [{"term", "count", "subterms": [...]?}]}], "times": {...},
"suggestions": {word: [suggestion...]}}``

``response_to_wire`` renders a :class:`SearchResult` into that JSON;
``response_from_wire`` parses it back (the remote-client direction,
``LuceneResponse.fromJson``).  Our flat rollup drilldown counts
(``{"a": n, "a>b": m}``) nest into the reference's term/subterm tree and
flatten back losslessly.  Exercised by ``tests/test_response_wire.py``
mirroring ``LuceneResponseToJsonTest.java`` and
``test/luceneresponsetest.py``.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from .engine import SearchResult

__all__ = ["response_to_wire", "response_from_wire"]

_HIT_META_COLS = {"docid", "__id__", "score", "duplicateCount"}


def _nest_terms(flat: dict[Any, int]) -> list[dict]:
    """Flat rollup counts ({'a': 3, 'a>b': 1}) → nested term/subterm list
    (DrilldownData.Term with optional subTerms, LuceneResponse.java:254-266)."""
    roots: list[dict] = []
    by_path: dict[tuple, dict] = {}
    for key, count in flat.items():
        parts = tuple(str(key).split(">"))
        node = {"term": parts[-1], "count": int(count)}
        by_path[parts] = node
        if len(parts) == 1:
            roots.append(node)
        else:
            parent = by_path.get(parts[:-1])
            if parent is None:  # orphan level — promote to root
                roots.append(node)
            else:
                parent.setdefault("subterms", []).append(node)
    return roots


def _flatten_terms(terms: list[dict], prefix: str = "") -> dict[str, int]:
    out: dict[str, int] = {}
    for t in terms:
        key = prefix + t["term"]
        out[key] = int(t["count"])
        for sub in t.get("subterms") or ():
            out.update(_flatten_terms([sub], key + ">"))
    return out


def response_to_wire(
    res: SearchResult,
    core: str | None = None,
    query_time: int = 0,
    times: dict[str, int] | None = None,
    dedup_field: str | None = None,
) -> dict:
    """SearchResult → LuceneResponse JSON dict (LuceneResponse.toJson)."""
    out: dict[str, Any] = {"total": int(res.total), "queryTime": int(query_time)}
    hits: list[dict] = []
    if res.cluster_hits is not None:
        for h in res.cluster_hits:  # ClusterHit → duplicates (:199-215)
            hit: dict[str, Any] = {"id": h.id, "score": float(h.score)}
            hit["duplicates"] = {
                "topDocs": [
                    {"id": d.doc_id, "score": float(d.score)} for d in h.top_docs
                ],
                "topTerms": [
                    {"term": t.term, "score": float(t.score)} for t in h.top_terms
                ],
            }
            hits.append(hit)
    else:
        tbl = res.hits
        cols = [c for c in tbl.column_names if c not in _HIT_META_COLS]
        if dedup_field is not None and dedup_field in cols:
            cols.remove(dedup_field)
        ids = tbl["__id__"].to_pylist() if "__id__" in tbl.column_names else []
        scores = (
            tbl["score"].to_pylist() if "score" in tbl.column_names else [0.0] * len(ids)
        )
        dup_counts = (
            tbl["duplicateCount"].to_pylist()
            if "duplicateCount" in tbl.column_names
            else None
        )
        stored = {c: tbl[c].to_pylist() for c in cols}
        for i, (hid, sc) in enumerate(zip(ids, scores)):
            hit = {"id": hid, "score": float(sc)}  # null id stays null (:169-173)
            for c in cols:
                v = stored[c][i]
                if v is not None:
                    # Lucene stored fields are multi-valued → array (:175-192)
                    hit[c] = list(v) if isinstance(v, list) else [v]
            if dup_counts is not None and dedup_field is not None:
                hit["duplicateCount"] = {dedup_field: int(dup_counts[i])}
            hits.append(hit)
    out["hits"] = hits
    if res.total_with_duplicates is not None:
        out["totalWithDuplicates"] = int(res.total_with_duplicates)
    if res.drilldown_data:
        out["drilldownData"] = [
            {
                "fieldname": fieldname,
                "core": core,
                "path": [],
                "terms": _nest_terms(flat),
            }
            for fieldname, flat in res.drilldown_data.items()
        ]
    if times:
        out["times"] = dict(times)
    if res.suggestions is not None:
        out["suggestions"] = {
            word: [s[0] if isinstance(s, (tuple, list)) else str(s) for s in entries]
            for word, entries in res.suggestions.items()
        }
    return out


def response_from_wire(d: dict | str) -> SearchResult:
    """LuceneResponse JSON → SearchResult (LuceneResponse.fromJson analog —
    the remote-client parse direction)."""
    if isinstance(d, str):
        d = json.loads(d)
    hits = d.get("hits", [])
    ids = [h.get("id") for h in hits]
    scores = [float(h.get("score", 0.0)) for h in hits]
    columns: dict[str, list] = {
        "__id__": ids,
        "score": scores,
    }
    stored_names = sorted(
        {k for h in hits for k in h}
        - {"id", "score", "duplicateCount", "duplicates"}
    )
    for name in stored_names:
        columns[name] = [h.get(name) for h in hits]
    dup = [h.get("duplicateCount") for h in hits]
    if any(dup):
        columns["duplicateCount"] = [
            next(iter(c.values())) if c else None for c in dup
        ]
    tbl = pa.table(columns) if ids else pa.table({"__id__": pa.array([], pa.string()), "score": pa.array([], pa.float64())})
    drilldown = {
        dd["fieldname"]: _flatten_terms(dd.get("terms", []))
        for dd in d.get("drilldownData", [])
    }
    return SearchResult(
        total=int(d.get("total", 0)),
        hits=tbl,
        drilldown_data=drilldown,
        total_with_duplicates=d.get("totalWithDuplicates"),
        suggestions=d.get("suggestions"),
    )
