"""Autocomplete — the suggestion subsystem (SURVEY.md §2.10, O27).

Reference pipeline being re-expressed:
- O27a shingle extraction: record values → word shingles
  (/root/reference/src/org/meresco/lucene/suggestion/SuggestionIndex.java:94-121,234-244);
- O27b ngram index build: per shingle, char bi/trigram fields with ``$word$``
  boundary markers + filter keys; built into a temp dir then atomically
  swapped (SuggestionNGramIndex.java:109-201; SuggestionIndex.java:132-190);
- O27c suggest query: AND of char-ngram terms (trigrams when the word is
  long enough, skipping the trailing ``$`` ngram), optional key-set filter
  (SuggestionNGramIndex.java:225-276; SuggestionNGramKeysFilter.java);
- O27d python re-ranking: ``distanceScore = max(0, −log(dist+1)/4+1)``,
  ``sortScore = distanceScore · score² · (matchScore·2)``, dedup, top-10
  (meresco/lucene/suggestionindexcomponent.py handleRequest).

Ray mapping (SURVEY §2.10): the build is a mini index pipeline —
``map_batches(shingle explode) → groupby(shingle) aggregate`` — and serving
is one small reader (actor-friendly: load once, query many).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis import arrow_tokens, char_ngrams, tokenize, word_shingles
from .spell import levenshtein


CONCAT_MARKER = "$$--$$"  # SuggestionIndex.java:57


def build_suggestion_index(
    ds,
    value_col: str,
    out_path: str,
    key_col: str | None = None,
    min_shingle: int = 1,
    max_shingle: int = 3,
    num_parts: int = 64,
    type_col: str | None = None,
    creator_col: str | None = None,
) -> str:
    """Shingle-explode the value column, aggregate counts (+ filter keys),
    write the suggestion table atomically (temp file + rename).

    Each suggestion term carries the value's type/creator via the reference's
    ``type$$--$$creator$$--$$value`` scheme (SuggestionIndex.java:57,116) —
    distinct (type, creator, shingle) combinations are distinct suggestions,
    filterable at query time (O27a).

    The aggregate groups by a HASH PARTITION of the shingle space and
    dictionary-encodes/run-detects inside each part — Python cost is
    O(num_parts), not O(distinct shingles)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a_arrow

    empty = pa.table(
        {
            "shingle": pa.array([], type=pa.string()),
            "key": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
        }
    )

    def _str_col(batch: pa.Table, name: str | None, n_rows: int):
        if name is None:
            return pa.array([""] * n_rows, type=pa.string())
        col = pc.fill_null(pc.cast(batch[name], pa.string()), "")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def explode(batch: pa.Table) -> pa.Table:
        """Shingle explode, Arrow/numpy end to end: tokenize the whole column
        in C kernels (``arrow_tokens``, pinned token-equal to the per-row
        spec by tests/test_properties.py), then build each shingle length n
        as a windowed ``binary_join_element_wise`` over the doc-contiguous
        token stream — valid starts are where ``doc_idx[i] == doc_idx[i+n-1]``.
        No Python loop over rows or shingles."""
        n_rows = len(batch)
        codes, doc_idx, dictionary, _dl = arrow_tokens(batch[value_col])
        if not len(codes):
            return empty
        toks = dictionary.take(pa.array(codes))
        sh_parts: list[pa.Array] = []
        doc_parts: list[np.ndarray] = []
        for n in range(min_shingle, max_shingle + 1):
            if n == 1:
                sh_parts.append(toks)
                doc_parts.append(doc_idx)
                continue
            if len(codes) < n:
                continue
            mask = doc_idx[: -(n - 1)] == doc_idx[n - 1 :]
            starts = np.flatnonzero(mask)
            if not starts.size:
                continue
            windows = [toks.take(pa.array(starts + j)) for j in range(n)]
            sh_parts.append(pc.binary_join_element_wise(*windows, " "))
            doc_parts.append(doc_idx[starts])
        if not sh_parts:
            return empty
        shingles = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in sh_parts]
        )
        docs = np.concatenate(doc_parts)
        # the reference's type$$--$$creator$$--$$value term scheme is applied
        # even when untyped (SuggestionIndex.java:57,116)
        prefix = pc.binary_join_element_wise(
            _str_col(batch, type_col, n_rows),
            _str_col(batch, creator_col, n_rows),
            "",
            CONCAT_MARKER,
        )
        sh = pc.binary_join_element_wise(prefix.take(pa.array(docs)), shingles, "")
        sh = sh.combine_chunks() if isinstance(sh, pa.ChunkedArray) else sh
        if key_col:
            kcol = pc.fill_null(pc.cast(batch[key_col], pa.int64()), -1)
            keys = kcol.to_numpy(zero_copy_only=False)[docs]
        else:
            keys = np.full(len(docs), -1, dtype=np.int64)
        part = (fnv1a_arrow(sh) % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "shingle": sh,
                "key": pa.array(keys),
                "part": pa.array(part),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def agg_part(t: pa.Table) -> pa.Table:
        sh = t["shingle"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        keys = t["key"].to_numpy()
        enc = pc.dictionary_encode(sh)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = enc.dictionary
        g = len(dic)
        counts = np.bincount(codes, minlength=g).astype(np.int64)
        m = keys >= 0
        ck, kk = codes[m], keys[m]
        order = np.lexsort((kk, ck))
        c_s, k_s = ck[order], kk[order]
        first = np.ones(c_s.size, dtype=bool)
        first[1:] = (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])
        per_code = np.bincount(c_s[first], minlength=g)
        offsets = np.concatenate(([0], np.cumsum(per_code))).astype(np.int64)
        return pa.table(
            {
                "shingle": dic,
                "count": pa.array(counts),
                "keys": pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()), pa.array(k_s[first])
                ),
            }
        )

    import ray

    agg = (
        exploded.groupby("part")
        .map_groups(agg_part, batch_format="pyarrow")
        .select_columns(["shingle", "count", "keys"])
    )
    parts = [t for t in ray.get(agg.to_arrow_refs()) if len(t)]
    table = (
        pa.concat_tables(parts, promote_options="default")
        if parts
        else pa.table(
            {
                "shingle": pa.array([], type=pa.string()),
                "count": pa.array([], type=pa.int64()),
                "keys": pa.array([], type=pa.list_(pa.int64())),
            }
        )
    )
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)  # atomic swap (SuggestionIndex.java:132-190)
    return out_path


class AutocompleteReader:
    """Serving side: loads the suggestion table once (per actor), answers
    suggest() queries via an in-memory char-ngram inverted index."""

    def __init__(self, path: str):
        t = pq.read_table(path)
        raw: list[str] = t["shingle"].to_pylist()
        # split the type$$--$$creator$$--$$value term scheme
        # (SuggestionNGramIndex.java:129); legacy rows without the marker
        # read as untyped suggestions
        self.types: list[str] = []
        self.creators: list[str] = []
        self.shingles: list[str] = []
        for r in raw:
            parts = r.split(CONCAT_MARKER, 2)
            if len(parts) == 3:
                ty, cr, sh = parts
            else:
                ty, cr, sh = "", "", r
            self.types.append(ty)
            self.creators.append(cr)
            self.shingles.append(sh)
        self.counts = t["count"].to_numpy()
        self.keys: list[list[int]] = t["keys"].to_pylist()
        # index BOTH bigrams and trigrams per shingle — the reference keeps
        # two ngram fields and the query picks one by word length
        # (SuggestionNGramIndex.java:109-143 BIGRAM/TRIGRAM fields)
        self.ngram_index: dict[str, list[int]] = {}
        for i, s in enumerate(self.shingles):
            grams: set[str] = set()
            for w in tokenize(s):
                grams.update(char_ngrams(w, 2))
                if len(w) > 2:
                    grams.update(char_ngrams(w, 3))
            for g in grams:
                self.ngram_index.setdefault(g, []).append(i)

    @staticmethod
    def _query_ngrams(value: str, trailing: bool) -> list[str]:
        """Trigrams for words of length > 2, else bigrams; the query side
        skips the trailing ``$``-closing ngram of the LAST word so partial
        words match (SuggestionNGramIndex.java:225-247)."""
        words = tokenize(value)
        out: list[str] = []
        for wi, w in enumerate(words):
            n = 3 if len(w) > 2 else 2
            grams = char_ngrams(w, n)
            if not trailing and wi == len(words) - 1 and grams:
                grams = grams[:-1]
            out.extend(grams)
        return out

    def suggest(
        self,
        value: str,
        limit: int = 10,
        filter_keys: set[int] | None = None,
        filters: list[str] | None = None,
    ) -> list[tuple[str, float]]:
        """``filters``: reference-style ``field=value`` strings over the
        ``type``/``creator`` fields (SuggestionNGramIndex.createFilter,
        :268-280) — every filter must match (FILTER conjunction)."""
        grams = self._query_ngrams(value, trailing=False)
        if not grams:
            return []
        field_filters: list[tuple[str, str]] = []
        for f in filters or []:
            fld, _, val = f.partition("=")
            field_filters.append((fld, val))
        candidate_ids: np.ndarray | None = None
        for g in grams:
            ids = np.asarray(self.ngram_index.get(g, []), dtype=np.int64)
            candidate_ids = (
                ids
                if candidate_ids is None
                else candidate_ids[np.isin(candidate_ids, ids, assume_unique=True)]
            )
            if candidate_ids.size == 0:
                return []
        scored = []
        vnorm = value.lower().strip()
        for i in candidate_ids.tolist():
            if filter_keys is not None and not (set(self.keys[i]) & filter_keys):
                continue
            if field_filters:
                row = {"type": self.types[i], "creator": self.creators[i]}
                if any(row.get(fld) != val for fld, val in field_filters):
                    continue
            s = self.shingles[i]
            dist = levenshtein(vnorm, s)
            distance_score = max(0.0, -math.log(dist + 1) / 4 + 1)
            match_score = 1.0 if s.startswith(vnorm) else 0.5
            score = float(self.counts[i])
            sort_score = distance_score * score * score * (match_score * 2)
            scored.append((i, s, sort_score))
        # dedup + top-10 (suggestionindexcomponent.py handleRequest)
        seen: set[str] = set()
        out = []
        for _, s, sc in sorted(scored, key=lambda x: (-x[2], x[1])):
            if s in seen:
                continue
            seen.add(s)
            out.append((s, sc))
            if len(out) >= limit:
                break
        return out

    def suggest_records(
        self,
        value: str,
        limit: int | None = None,
        filter_keys: set[int] | None = None,
        filters: list[str] | None = None,
    ) -> list[dict]:
        """The server-side ``/suggest`` row shape
        (SuggestionNGramIndex.java:250-258, Suggestion :287-302): one record
        per index row — suggestion, type, creator (None when untyped) and
        the index-side score (shingle count, the doc-frequency weight) —
        ranked like :meth:`suggest` but WITHOUT the dedup-by-suggestion the
        front-door component applies later."""
        grams = self._query_ngrams(value, trailing=False)
        if not grams:
            return []
        field_filters = [tuple(f.partition("=")[::2]) for f in filters or []]
        candidate_ids: np.ndarray | None = None
        for g in grams:
            ids = np.asarray(self.ngram_index.get(g, []), dtype=np.int64)
            candidate_ids = (
                ids
                if candidate_ids is None
                else candidate_ids[np.isin(candidate_ids, ids, assume_unique=True)]
            )
            if candidate_ids.size == 0:
                return []
        vnorm = value.lower().strip()
        scored: list[tuple[float, int]] = []
        for i in candidate_ids.tolist():
            if filter_keys is not None and not (set(self.keys[i]) & filter_keys):
                continue
            if field_filters:
                row = {"type": self.types[i], "creator": self.creators[i]}
                if any(row.get(fld) != val for fld, val in field_filters):
                    continue
            s = self.shingles[i]
            dist = levenshtein(vnorm, s)
            distance_score = max(0.0, -math.log(dist + 1) / 4 + 1)
            match_score = 1.0 if s.startswith(vnorm) else 0.5
            score = float(self.counts[i])
            scored.append((distance_score * score * score * (match_score * 2), i))
        scored.sort(key=lambda x: (-x[0], self.shingles[x[1]]))
        if limit is not None:
            scored = scored[:limit]
        return [
            {
                "suggestion": self.shingles[i],
                "type": self.types[i] or None,
                "creator": self.creators[i] or None,
                "score": float(self.counts[i]),
            }
            for _, i in scored
        ]
