"""SuggestionIndexComponent — the suggestion front door.

Re-expresses ``meresco/lucene/suggestionindexcomponent.py:44-155``
(``suggestionindexcomponenttest.py``) backed by this engine's
:class:`~meresco_lucene_ray.suggest.store.SuggestionIndexStore` instead of
an HTTP hop to the Java suggestion server (the `_Connect` POST/GET pairs
become direct store/reader calls — same argument protocol, same response
shaping):

- ``add_suggestions`` unpacks ``values=[{title,type,creator}]`` into the
  parallel title/type/creator arrays the reference posts (:49-53);
- ``suggest`` returns ``Suggestion`` records (suggestion/type/creator/
  index-side score) like the server's ``/suggest`` (:64-66);
- ``handle_request`` renders the opensearch ``application/x-suggestions+
  json`` body — re-scored with the distance/match formula (:115-135),
  minScore-gated, ranked by sortScore, deduped top-10, with the concepts
  triple list and the x-debug envelope — and the exact CORS header block.
"""

from __future__ import annotations

import json
import os
from math import log
from time import time
from typing import Any

from .spell import levenshtein
from .store import SuggestionIndexStore

__all__ = ["Suggestion", "SuggestionIndexComponent", "match"]

CRLF = "\r\n"
_HEADER = (
    "HTTP/1.0 200 OK" + CRLF
    + "Content-Type: application/x-suggestions+json" + CRLF
    + "Access-Control-Allow-Origin: *" + CRLF
    + "Access-Control-Allow-Headers: X-Requested-With" + CRLF
    + "Access-Control-Allow-Methods: GET, POST, OPTIONS" + CRLF
    + "Access-Control-Max-Age: 86400" + CRLF
)


class Suggestion(dict):
    """Attribute-style row (suggestionindexcomponent.py:148-150)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e


def match(value: str, suggestion: str) -> int:
    """Word-containment count (suggestionindexcomponent.py:152-157)."""
    matches = 0
    for v in value.split():
        if v in suggestion:
            matches += 1
    return matches


class SuggestionIndexComponent:
    def __init__(self, store: SuggestionIndexStore | str):
        self._store = (
            store if isinstance(store, SuggestionIndexStore) else SuggestionIndexStore(store)
        )
        self._key_sets: dict[str, set[int]] = {}

    @property
    def store(self) -> SuggestionIndexStore:
        return self._store

    # ---- update protocol (:49-62) ---------------------------------------
    def add_suggestions(self, identifier: str, key: int, values: list[dict]) -> None:
        titles = [v.get("title") for v in values]
        types = [v.get("type") for v in values]
        creators = [v.get("creator") for v in values]
        self._store.add(identifier, key, values=titles, types=types, creators=creators)

    def delete_suggestions(self, identifier: str) -> None:
        self._store.delete(identifier)

    def register_filter_key_set(self, name: str, key_set) -> None:
        self._key_sets[name] = set(key_set)

    def create_suggestion_ngram_index(self) -> None:
        self._store.create_suggestion_ngram_index()

    def commit(self) -> None:
        self._store.commit()

    # ---- query protocol (:64-83) ----------------------------------------
    def suggest(
        self,
        value: str,
        trigram: bool = False,
        filters: list[str] | None = None,
        key_set_name: str | None = None,
        limit: int | None = None,
    ) -> list[Suggestion]:
        filter_keys = self._key_sets.get(key_set_name) if key_set_name else None
        records = self._store.reader().suggest_records(
            value, limit=limit, filter_keys=filter_keys, filters=filters or []
        )
        return [Suggestion(r) for r in records]

    def total_shingle_records(self) -> int:
        return self._store.num_docs()

    def ngram_index_timestamp(self) -> float:
        """Seconds since epoch of the last ngram rebuild (the reference
        returns server ms / 1000.0, :80-82)."""
        path = self._store.suggest_path
        return os.path.getmtime(path) if os.path.exists(path) else 0.0

    def indexing_state(self) -> dict | None:
        if self._store.ngram_index_stale():
            return {"stale": True}
        return None

    # ---- opensearch front door (:85-146) --------------------------------
    def handle_request(
        self, path: str, arguments: dict[str, list[str]], **_kwargs: Any
    ) -> tuple[str, str]:
        """Returns ``(header, body)`` — the reference yields these over the
        socket; content is byte-identical."""
        value = arguments.get("value", [None])[0]
        debug = arguments.get("x-debug", ["False"])[0] != "False"
        trigram = arguments.get("trigram", ["False"])[0] != "False"
        show_concepts = arguments.get("concepts", ["False"])[0] != "False"
        filters = arguments.get("filter", None)
        min_score = float(arguments.get("minScore", ["0"])[0])
        apikey = arguments.get("apikey", [None])[0]
        apikey_filter = arguments.get("x-apikey-filter", [""])[0]
        if apikey_filter:
            apikey = (apikey or "") + "-" + apikey_filter

        suggest = None
        t_total = 0.0
        if value:
            t0 = time()
            suggest = self.suggest(
                value, trigram=trigram, filters=filters, key_set_name=apikey
            )
            t_total = time() - t0

        result: list = []
        if value:
            suggestions = []
            for s in suggest:
                suggestion = str(s.suggestion)
                record_type = str(s.type) if s.type else None
                creator = str(s.creator) if s.creator else None
                distance_score = max(
                    0.0,
                    -log(levenshtein(value.lower(), suggestion.lower()) + 1) / 4 + 1,
                )
                match_score = match(value.lower(), suggestion.lower())
                score = float(s.score)
                sort_score = distance_score * score**2 * (match_score * 2)
                scores = dict(
                    distanceScore=distance_score,
                    score=score,
                    sortScore=sort_score,
                    matchScore=match_score,
                )
                if sort_score > min_score:
                    suggestions.append((suggestion, record_type, creator, scores))
            suggestions = sorted(
                suggestions, reverse=True, key=lambda t: t[3]["sortScore"]
            )
            if debug:
                concepts = [(s, t, c) for s, t, c, _ in suggestions if t]
                body = json.dumps(
                    dict(
                        value=value,
                        suggestions=suggestions,
                        concepts=concepts,
                        time=t_total,
                    )
                )
                return _HEADER, body
            concepts = [(s, t, c) for s, t, c, _ in suggestions if t][:10]
            dedup: list[str] = []
            for s in suggestions:
                if s[0] not in dedup:
                    dedup.append(s[0])
            result = [value, dedup[:10]]
            if show_concepts:
                result.append(concepts)
        return _HEADER, json.dumps(result)
