"""Lucene — the per-core component facade.

Re-expresses ``meresco/lucene/_lucene.py:42-185`` (the client component,
``lucenetest.py``) and the server lifecycle it drives
(``src/org/meresco/lucene/Lucene.java``: buffered updates, commitCount
policy, executeQuery argument protocol) as ONE in-process object over the
Ray build + searcher — the HTTP hop disappears, the argument protocol and
semantics stay:

- ``add_document(fields, identifier)`` takes wire field dicts
  (docwire/DocumentUtil shapes), flattens them through ``doc_to_row`` and
  buffers; every ``settings.commit_count`` buffered updates auto-commit
  (Lucene.java commitCount; commitTimeout needs a background thread the
  facade doesn't run — call ``commit()`` or rely on the count).
- ``delete(identifier=..., lucene_query=...)`` — by id (tombstone) or by
  query (collect-and-tombstone, ``delete_by_query``).
- ``execute_query`` mirrors the reference kwargs (start/stop, facets as
  ``{fieldname, maxTerms}``, sortKeys as ``{sortBy, sortDescending}`` with
  registry missing-value defaulting, dedup, clustering, storedFields,
  suggestionRequest) and returns the engine ``SearchResult`` with the
  reference's ``info`` envelope attached.
- readonly connections refuse updates with the reference's exact errors.

Columnar adaptation (documented): the facade is constructed with
``text_col`` (the default tokenized column) plus optional ``text_fields``
— additional per-field-postings text columns, matching the reference's
per-field Lucene postings (DocumentStringToDocument.java:84-158).  Wire
TextFields land in their own columns when registered in ``text_fields``
and fold into ``text_col`` otherwise; queries naming a registered text
field become field-scoped TermQ/PhraseQ/PrefixQ.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Sequence

import pyarrow as pa

from .docwire import doc_to_row
from .settings import LuceneSettings

__all__ = ["Lucene", "ListResponse", "MultiLucene"]


@dataclass
class ListResponse:
    """LuceneResponse with plain-list hits (prefixSearch / fieldnames /
    drilldownFieldnames responses, _lucene.py:132-159)."""

    total: int
    hits: list = field(default_factory=list)


class Lucene:
    def __init__(
        self,
        index_dir: str,
        name: str = "core",
        settings: LuceneSettings | None = None,
        readonly: bool = False,
        text_col: str = "content",
        stored_cols: Sequence[str] = (),
        text_fields: Sequence[str] = (),
        num_actors: int = 2,
        index_config=None,
    ):
        self._index_dir = index_dir
        self._name = name
        self.settings = settings or LuceneSettings()
        self._readonly = readonly
        self._registry = self.settings.field_registry
        if index_config is None:
            index_config = self.settings.to_index_config(
                text_col,
                id_col="__id__",
                stored_cols=tuple(stored_cols),
                text_fields=tuple(text_fields),
            )
        self._cfg = index_config
        self._num_actors = num_actors
        self._pending_adds: list[dict] = []
        self._pending_deletes: list[str] = []
        self._searcher = None

    # ---- plumbing -------------------------------------------------------
    @property
    def core_name(self) -> str:
        return self._name

    def _check_writable(self, what: str) -> None:
        if self._readonly:
            raise RuntimeError(
                f"{what} not allowed for readonly Lucene connection."
            )

    def _has_index(self) -> bool:
        return os.path.exists(os.path.join(self._index_dir, "manifest.json"))

    def wire_config(self):
        """WireConfig matching this core's schema: wire terms naming the
        text column (or a per-field text field) convert to (field-scoped)
        text queries; anything else stays a keyword/docvalue query."""
        from .query.wireproto import WireConfig

        return WireConfig(
            text_col=self._cfg.text_col,
            text_cols=frozenset(self._cfg.text_fields),
        )

    @property
    def searcher(self):
        if self._searcher is None:
            from .query.engine import IndexSearcher

            self._searcher = IndexSearcher(
                self._index_dir, num_actors=self._num_actors
            )
        return self._searcher

    # ---- settings surface (:59-73) --------------------------------------
    def set_settings(
        self, number_of_concurrent_tasks=None, similarity=None, clustering=None
    ) -> None:
        self._check_writable("Changing settings")
        d: dict[str, Any] = {}
        if number_of_concurrent_tasks:
            d["numberOfConcurrentTasks"] = number_of_concurrent_tasks
        if similarity:
            d["similarity"] = dict(
                type="BM25Similarity", k1=similarity["k1"], b=similarity["b"]
            )
        if clustering:
            d["clustering"] = clustering
        if d:
            self.settings.update_settings(d)

    def get_settings(self) -> dict:
        return self.settings.as_post_dict()

    # ---- update protocol (:75-90, Lucene.java commitCount) --------------
    def add_document(self, fields: list[dict], identifier: str | None = None) -> None:
        self._check_writable("Adding documents")
        if identifier is None:
            raise ValueError("'identifier' is required in this engine (docids derive from it)")
        row = doc_to_row(fields)
        row["__id__"] = identifier
        self._pending_adds.append(row)
        self._maybe_commit()

    def delete(self, identifier: str | None = None, lucene_query=None):
        self._check_writable("Deleting")
        if identifier is not None:
            self._pending_deletes.append(identifier)
            self._maybe_commit()
            return
        if lucene_query is None:
            # the reference's exact (misspelled) message, _lucene.py:86
            raise ValueError("'specifify either 'identifier' or 'luceneQuery'")
        from .index.build import delete_by_query
        from .query.wireproto import wire_to_ast

        self.commit()
        q = (
            wire_to_ast(lucene_query, self.wire_config())
            if isinstance(lucene_query, dict)
            else lucene_query
        )
        if self._has_index():
            delete_by_query(self._index_dir, q, searcher=self.searcher)
            self._refresh()

    def _maybe_commit(self) -> None:
        if (
            len(self._pending_adds) + len(self._pending_deletes)
            >= self.settings.commit_count
        ):
            self.commit()

    def commit(self) -> None:
        """Flush buffered updates into the index (Lucene.java commit():
        new segments + tombstones, then NRT reopen)."""
        adds, dels = self._pending_adds, self._pending_deletes
        self._pending_adds, self._pending_deletes = [], []
        if adds:
            import ray.data as rd

            from .index.build import add_documents, build_index

            cols: dict[str, list] = {}
            names: list[str] = []
            for r in adds:
                for k in r:
                    if k not in cols:
                        cols[k] = []
                        names.append(k)
            for r in adds:
                for k in names:
                    cols[k].append(r.get(k))
            for tc in (self._cfg.text_col, *self._cfg.text_fields):
                if tc in cols:
                    cols[tc] = [v if v is not None else "" for v in cols[tc]]
                elif tc != self._cfg.text_col:
                    # a text field absent from this batch still needs its
                    # (empty) column — the tokenizer reads every text field
                    cols[tc] = ["" for _ in adds]
            ds = rd.from_arrow(pa.table(cols))
            if self._has_index():
                add_documents(ds, self._index_dir, self._cfg)
            else:
                build_index(ds, self._index_dir, self._cfg)
        if dels and self._has_index():
            from .index.build import delete_documents

            delete_documents(self._index_dir, dels)
        if adds or dels:
            self._refresh()

    def _refresh(self) -> None:
        if self._searcher is not None:
            self._searcher.refresh()

    # ---- query protocol (:91-130) ---------------------------------------
    def update_sort_key(self, sort_key: dict) -> dict:
        """updateSortKey (:91-96): registry missing-value + type defaulting."""
        if self._registry is not None and "missingValue" not in sort_key:
            mv = self._registry.default_missing_value_for_sort(
                sort_key["sortBy"], bool(sort_key.get("sortDescending"))
            )
            if mv:
                sort_key["missingValue"] = mv
        return sort_key

    def execute_query(
        self,
        lucene_query,
        start: int | None = None,
        stop: int | None = None,
        facets: list | None = None,
        sort_keys: list | None = None,
        suggestion_request: dict | None = None,
        dedup_field: str | None = None,
        dedup_sort_field: str | None = None,
        clustering: bool = False,
        stored_fields: Sequence[str] | None = None,
        **kwargs: Any,
    ):
        from .query.wireproto import wire_to_ast

        stop = 10 if stop is None else stop
        start = 0 if start is None else start
        q = (
            wire_to_ast(lucene_query, self.wire_config())
            if isinstance(lucene_query, dict)
            else lucene_query
        )

        sort = None
        if sort_keys:
            sort = []
            for sk in sort_keys:
                sk = self.update_sort_key(dict(sk))
                sort.append(
                    (sk["sortBy"], bool(sk.get("sortDescending")), sk.get("missingValue"))
                )

        facet_specs: list[str] = []
        max_terms: dict[str, int] = {}
        for f in facets or []:
            if isinstance(f, str):
                facet_specs.append(f)
            else:
                facet_specs.append(f["fieldname"])
                if f.get("maxTerms"):
                    max_terms[f["fieldname"]] = int(f["maxTerms"])

        if clustering and self.settings.cluster_config is not None:
            response = self.searcher.cluster_top_docs(
                q, self.settings.cluster_config, start=start, stop=stop
            )
        else:
            response = self.searcher.execute(
                q,
                start=start,
                stop=stop,
                sort=sort,
                facets=facet_specs,
                stored_fields=tuple(stored_fields or ()),
                dedup_field=dedup_field,
                dedup_sort_field=dedup_sort_field,
                suggestion_request=suggestion_request,
            )
        for col, mt in max_terms.items():
            dd = response.drilldown_data.get(col)
            if dd is not None and len(dd) > mt:
                response.drilldown_data[col] = dict(list(dd.items())[:mt])
        response.info = {
            "type": "Query",
            "query": {
                k: v
                for k, v in dict(
                    luceneQuery=lucene_query,
                    start=start,
                    stop=stop,
                    facets=facets,
                    suggestionRequest=suggestion_request,
                    **kwargs,
                ).items()
                if v
            },
        }
        return response

    def prefix_search(
        self, fieldname: str, prefix: str, show_count: bool = False, limit: int = 10
    ) -> ListResponse:
        """prefixSearch (:132-142): terms of the named field starting with
        ``prefix``, most-frequent first.  The searcher scopes the scan —
        default text column / per-field text postings / keyword docvalue
        values (engine.prefix_search).  A fieldname that is neither stored
        nor a registered text field folds to the default text column, the
        same aliasing the update route applies to unregistered TextFields
        (their terms live in the default column's postings)."""
        known = {self._cfg.text_col, *self._cfg.text_fields, *self._cfg.stored_cols}
        if fieldname is not None and fieldname not in known:
            fieldname = None
        pairs = self.searcher.prefix_search(prefix, limit=limit, field=fieldname)
        ranked = sorted(pairs, key=lambda t: t[1], reverse=True)
        hits = [(t, c) if show_count else t for t, c in ranked]
        return ListResponse(total=len(hits), hits=hits)

    def fieldnames(self) -> ListResponse:
        names = self.searcher.fieldnames()
        return ListResponse(total=len(names), hits=names)

    def drilldown_fieldnames(
        self, path=None, limit: int = 50, order: str = "taxonomy"
    ) -> ListResponse:
        """:150-159: no path → the registered drilldown dims; otherwise
        ``path[0]`` is the dim and the rest the taxonomy path.  The facade
        defaults to the reference's taxonomy (insertion) order
        (Lucene.java:692-713); pass ``order='count'`` for most-frequent-first."""
        if not path:
            names = (
                list(self._registry.drilldown_field_names)[:limit]
                if self._registry is not None
                else []
            )
        else:
            names = self.searcher.drilldown_fieldnames(
                path[0], path=tuple(path[1:]), limit=limit, order=order
            )
        return ListResponse(total=len(names), hits=names)

    def similar_documents(self, identifier: str, text: str | None = None, stop: int = 10):
        """similarDocuments (:160-166).  ``text`` provides the document's
        content; without it the stored term vectors reconstruct the terms
        (IndexConfig.store_termvectors)."""
        if text is not None:
            return self.searcher.more_like_this(identifier, text, stop=stop)
        if not self.searcher.has_stored_termvectors():
            raise ValueError(
                "similar_documents needs `text` or an index built with "
                "store_termvectors=True"
            )
        from .query.ast import BoolQ, DocValEqQ, TermQ

        res = self.searcher.execute(DocValEqQ("__id__", identifier), stop=1)
        if res.total == 0:
            return ListResponse(total=0, hits=[])
        docid = res.hits["docid"][0].as_py()
        trip = self.searcher.termvector_triples([docid])
        terms = sorted(set(trip["term"].to_pylist()))
        q = BoolQ(
            should=tuple(TermQ(t) for t in terms),
            must_not=(DocValEqQ("__id__", identifier),),
        )
        return self.searcher.execute(q, stop=stop)

    def num_docs(self) -> int:
        return self.searcher.num_docs()

    def core_info(self) -> dict:
        """coreInfo (:173-181)."""
        return {
            "name": self._name,
            "numDocs": self.num_docs() if self._has_index() else 0,
        }


class MultiLucene:
    """Multi-core router (meresco/lucene/multilucene.py:39-77,
    ``multilucenetest.py``): routes single-core calls to the named
    :class:`Lucene` core and composed queries through a
    :class:`~.join.composed.MultiSearcher` over the cores' searchers.

    ``key_space`` sizes the numerated join-key domain the composed bitsets
    live in (TermNumerator ordinal space; the reference's server sizes it
    from the taxonomy)."""

    def __init__(
        self,
        cores: Sequence[Lucene],
        default_core: str,
        key_space: int = 1 << 16,
        cluster_config=None,
    ):
        self._cores = {c.core_name: c for c in cores}
        if default_core not in self._cores:
            raise ValueError(f"unknown defaultCore {default_core!r}")
        self._default_core = default_core
        self._key_space = key_space
        self._cluster_config = cluster_config
        self._multi = None

    def __getitem__(self, core: str) -> Lucene:
        return self._cores[core]

    def core_names(self) -> list[str]:
        return list(self._cores)

    @property
    def multi_searcher(self):
        if self._multi is None:
            from .join.composed import MultiSearcher

            self._multi = MultiSearcher(
                {name: c.searcher for name, c in self._cores.items()},
                key_space=self._key_space,
                cluster_config=self._cluster_config,
            )
        return self._multi

    # executeQuery (:48-51): route to the named (or default) core
    def execute_query(self, core: str | None = None, **kwargs):
        return self._cores[core or self._default_core].execute_query(**kwargs)

    # executeComposedQuery (:53-61): sort-key missing-value defaulting per
    # core happens inside MultiSearcher; the info envelope mirrors infoDict
    # (composedquery.py:269-273)
    def execute_composed_query(self, query):
        response = self.multi_searcher.execute(query)
        response.info = {
            "type": type(query).__name__,
            "query": {
                k.replace("_", ""): v for k, v in query.as_dict().items() if v
            },
        }
        return response

    # any_unknown routing (:63-70)
    def prefix_search(self, core: str | None = None, **kw):
        return self._cores[core or self._default_core].prefix_search(**kw)

    def fieldnames(self, core: str | None = None):
        return self._cores[core or self._default_core].fieldnames()

    def drilldown_fieldnames(self, core: str | None = None, **kw):
        return self._cores[core or self._default_core].drilldown_fieldnames(**kw)

    def similar_documents(self, core: str | None = None, **kw):
        return self._cores[core or self._default_core].similar_documents(**kw)

    def core_info(self) -> list[dict]:
        return [c.core_info() for c in self._cores.values()]
