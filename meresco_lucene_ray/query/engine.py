"""Sharded query engine: a stateful actor pool over index segments.

Reference parity: the engine is the Ray-native replacement for the
SuperCollector machinery — per-slice collectors merged at the top
(/root/reference/src/org/meresco/lucene/search/TopScoreDocSuperCollector.java:34-48,
MultiSuperCollector, Lucene.executeQuery at Lucene.java:253-320):

- each ``SegmentActor`` holds 1..m ``SegmentSearcher``s in memory (loaded once
  in ``__init__`` — the ST1 SearcherTaxonomyManager analog),
- a query fans out once per actor; per-segment top-k heaps / facet count
  maps / key bitsets come back and are merged on the driver exactly the way
  TopDocs.merge / array-sum / bitset-OR merge them,
- global BM25 stats use a two-phase exchange (collect per-shard df for the
  query's terms, sum, then score) — the distributed-IDF scheme of
  dfs_query_then_fetch search engines; N and avgdl come from the manifest.

Scale: fan-out is O(actors) messages each way per query phase; per-actor
payloads are top-k rows / count dicts / packed bitsets — never postings.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ast import BoolQ, KeyFilterQ, MatchAllQ, Occur, query_terms
from .scorer import BM25
from .segment import SegmentSearcher
from ..index.manifest import IndexManifest

DEFAULT_STOP = 10  # reference default page size (meresco/lucene/_lucene.py:98-99)
DEDUP_MORE_RECORDS = 100  # overfetch when dedup is on (Lucene.java:267-269)
MAX_RETRY_K = 10000  # paging retry cap (Lucene.java:312-319)

# dedup partial-row budget for the driver-side group merge; past it the
# merge routes through Ray Data (sort + per-block combine) and the driver
# only ever sees O(page × blocks) rows
DEDUP_DRIVER_MAX_ROWS = int(os.environ.get("MLR_DEDUP_DRIVER_MAX", "500000"))


def _evict_one(cache: dict) -> None:
    """Drop one (oldest-inserted) entry from a plain-dict LRU.  Concurrent
    clients are a supported mode and CPython dicts are not: between
    ``iter()`` and ``next()`` another thread may insert/evict, raising
    RuntimeError ("dictionary changed size during iteration") — or empty the
    dict (StopIteration), or pop the same key (handled by ``pop`` default).
    Losing one eviction under a race is harmless for a size-capped cache;
    corrupting a query is not."""
    try:
        cache.pop(next(iter(cache)), None)
    except (RuntimeError, StopIteration, KeyError):
        pass

def _sort_key_columns(
    tbl: pa.Table, sort, docid_col: str = "docid", col_map: dict | None = None
) -> tuple[pa.Table, list[tuple[str, str]]]:
    """Build the (key table, sort_keys) pair for the global hit ordering
    (TopDocs.merge analog): sort-field columns with the SAME missing-value
    fills as the per-segment cut (SegmentSearcher._sortable) so the global
    re-sort agrees with per-segment ordering on nullable columns, docid-asc
    tiebreak last.  The caller takes from its ORIGINAL table, so returned
    rows keep their original nulls.

    ``col_map`` maps a sort-spec column name to the table's actual column
    (the distributed dedup merge stores representatives' sort values under
    ``sv_``-prefixed columns).  Module-level so Ray Data map tasks can use
    the identical ordering off-driver."""
    from .segment import MISSING_LAST

    key_cols: dict[str, Any] = {"__tiebreak__": tbl[docid_col]}
    sort_keys: list[tuple[str, str]] = []
    for c, desc, missing in sort:
        direction = "descending" if desc else "ascending"
        src = (col_map or {}).get(c, c)
        if src not in tbl.column_names:
            continue
        col = tbl[src]
        if col.null_count:
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                fill = "" if missing is None else str(missing)
                col = pc.fill_null(col, fill)
            else:
                # pandas promoted nullable numerics to float64 with the
                # fill; mirror that exactly for ordering purposes
                fill = (
                    np.inf
                    if missing is None or missing is MISSING_LAST
                    else float(missing)
                )
                col = pc.fill_null(col.cast(pa.float64()), fill)
        key_cols[c] = col
        sort_keys.append((c, direction))
    sort_keys.append(("__tiebreak__", "ascending"))
    return pa.table(key_cols), sort_keys


def _first_per_key(t: pa.Table) -> pa.Table:
    """First row of each key run in a block of key-sorted partial rows —
    the per-block candidate cut both distributed dedup merges share."""
    keys = t["key"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    first[1:] = keys[1:] != keys[:-1]
    return t.take(pa.array(np.flatnonzero(first)))


def _valid_key_mask(key_col):
    """Fully-valid boolean mask of the non-null, non-NaN keys — shared by
    both dedup merge paths so their NULL semantics cannot drift.  MUST be
    ``and_kleene``: ``is_nan`` is null on a null element, and plain
    ``and_`` would propagate that null into the mask, where ``pc.all``
    (which skips nulls) lets a null-keyed row through the all-True fast
    path unfiltered.  With Kleene logic the second operand is only null
    where the first is already False, so the result carries no nulls."""
    valid = pc.is_valid(key_col)
    if pa.types.is_floating(key_col.type):
        valid = pc.and_kleene(valid, pc.invert(pc.is_nan(key_col)))
    return valid


def _drop_invalid_keys(t: pa.Table) -> pa.Table:
    """Drop partial rows whose dedup key is null/NaN (a numeric dedup field
    with missing values) BEFORE the distributed merge — keyless docs never
    form a group on any path (`_merge_group_partials` filters them on the
    driver path; without this the per-block run counts would tally each
    segment's NaN run as a distinct group and `total` would diverge).
    They still count toward totalWithDuplicates, which sums `cnt` upstream
    of this filter."""
    valid = _valid_key_mask(t["key"])
    if bool(pc.all(valid).as_py() or len(t) == 0):
        return t
    return t.filter(valid)


_num_rows_task = None


def _get_num_rows_task():
    """Tiny locality-scheduled task: partial-table row count without pulling
    the table to the driver (the distributed-vs-driver merge gate)."""
    global _num_rows_task
    if _num_rows_task is None:
        import ray

        _num_rows_task = ray.remote(num_cpus=0)(lambda t: t.num_rows)
    return _num_rows_task


class _SegmentActorImpl:
    """Holds several segments; all per-segment methods fan in here."""

    def __init__(self, index_dir: str, seg_paths: list[str], tombstones=None):
        # ``tombstones``: a tombstones.parquet PATH (loaded here, once per
        # actor, bloom pre-filtered per segment — index/tombstones.py), a
        # legacy dict, or None
        if isinstance(tombstones, str):
            from ..index.tombstones import TombstoneSet

            tombstones = TombstoneSet(tombstones)
        self.searchers = [
            SegmentSearcher(os.path.join(index_dir, p), tombstones) for p in seg_paths
        ]

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self.searchers:
            for t, df in s.term_stats(terms).items():
                out[t] = out.get(t, 0) + df
        return out

    def top_k(self, q, k, sim, stats, sort_spec, cols):
        tables = [s.top_k(q, k, sim, stats, sort_spec, cols) for s in self.searchers]
        total = sum(int(t.schema.metadata[b"total"]) for t in tables)
        merged = pa.concat_tables(tables, promote_options="default")
        return merged, total

    def _fused_pass(self, q, sim, stats, facet_specs, collect):
        """ONE eval per segment feeding an arbitrary collector AND the facet
        counters from the shared live-filtered match mask (the
        MultiCollector-of-SuperCollectors shape both fused paths use)."""
        tables = []
        facet_parts: list[dict[Any, int]] = [{} for _ in facet_specs]
        for s in self.searchers:
            mask, scores = s.eval(q, sim, stats)
            mask = s._apply_live(mask)
            tables.append(collect(s, mask, scores))
            for i, (col, mode) in enumerate(facet_specs):
                acc = facet_parts[i]
                for v, c in s.facet_counts(q, sim, stats, col, mode, _mask=mask).items():
                    acc[v] = acc.get(v, 0) + c
        return tables, facet_parts

    def search(self, q, k, sim, stats, sort_spec, cols, facet_specs):
        """Fused top-k + facet counts in ONE pass over each segment
        (MultiCollector-of-SuperCollectors analog — the reference collects
        TopScoreDocSuperCollector and FacetSuperCollector in a single
        IndexSearcher.search, Lucene.java:253-342): the query is evaluated
        once per segment and both collectors read the same match mask —
        one fan-out round trip instead of two, one eval instead of two."""
        tables, facet_parts = self._fused_pass(
            q,
            sim,
            stats,
            facet_specs,
            lambda s, m, sc: s.top_k(
                q, k, sim, stats, sort_spec, cols, _precomputed=(m, sc)
            ),
        )
        total = sum(int(t.schema.metadata[b"total"]) for t in tables)
        merged = pa.concat_tables(tables, promote_options="default")
        return merged, total, facet_parts

    def count(self, q, sim, stats) -> int:
        return sum(s.count(q, sim, stats) for s in self.searchers)

    def matching_ids(self, q, sim, stats) -> list[str]:
        out: list[str] = []
        for s in self.searchers:
            out.extend(s.matching_ids(q, sim, stats))
        return out

    def facet_counts(self, q, sim, stats, col, mode="auto"):
        out: dict[Any, int] = {}
        for s in self.searchers:
            for v, c in s.facet_counts(q, sim, stats, col, mode).items():
                out[v] = out.get(v, 0) + c
        return out

    def facet_children_first(self, col, path=()):
        out: dict[str, int] = {}
        for s in self.searchers:
            for v, d in s.facet_children_first(col, path).items():
                if d < out.get(v, 1 << 62):
                    out[v] = d
        return out

    def dedup_groups(self, q, sim, stats, key_col, sort_col, attach_cols=()):
        return pa.concat_tables(
            [
                s.dedup_groups(q, sim, stats, key_col, sort_col, attach_cols)
                for s in self.searchers
            ],
            promote_options="default",
        )

    def dedup_and_facets(
        self, q, sim, stats, key_col, sort_col, attach_cols, facet_specs
    ):
        """Fused dedup partials + facet counts in ONE pass per segment
        (DeDupFilterSuperCollector composing with FacetSuperCollector under
        one IndexSearcher.search, Lucene.java:436-480): the query is
        evaluated once and both collectors read the same match mask.
        Returned as two objects (num_returns=2) so the partial tables can
        flow into the distributed merge without dragging the facet dicts."""
        tables, facet_parts = self._fused_pass(
            q,
            sim,
            stats,
            facet_specs,
            lambda s, m, sc: s.dedup_groups(
                q, sim, stats, key_col, sort_col, attach_cols, _precomputed=(m, sc)
            ),
        )
        return pa.concat_tables(tables, promote_options="default"), facet_parts

    def collect_keys(self, q, sim, stats, key_col, size):
        bs = np.zeros(size, dtype=bool)
        for s in self.searchers:
            bs |= s.collect_keys(q, sim, stats, key_col, size)
        return np.packbits(bs)

    def key_max_scores(self, q, sim, stats, key_col, size):
        out = np.zeros(size, dtype=np.float64)
        for s in self.searchers:
            np.maximum(out, s.key_max_scores(q, sim, stats, key_col, size), out=out)
        return out

    def key_value_pairs(self, key_col, val_col):
        # per-searcher parts tagged with the segment base so the driver can
        # restore global docid order across actors (round-robin assignment
        # would otherwise make "last write wins" depend on actor count)
        out = []
        for s in self.searchers:
            k, v = s.key_value_pairs(key_col, val_col)
            out.append((s.base, k, v))
        return out

    def prefix_terms(self, prefix, limit, field=None):
        acc: dict[str, int] = {}
        truncated = False
        for s in self.searchers:
            terms, dfs, trunc = s.prefix_terms(prefix, limit, field)
            truncated |= trunc
            for t, d in zip(terms, dfs.tolist()):
                acc[t] = acc.get(t, 0) + d
        return acc, truncated

    def stored_prefix_counts(self, col, prefix, limit):
        acc: dict[str, int] = {}
        truncated = False
        for s in self.searchers:
            part, trunc = s.stored_prefix_counts(col, prefix, limit)
            truncated |= trunc
            for t, d in part.items():
                acc[t] = acc.get(t, 0) + d
        return acc, truncated

    def all_terms_stats(self) -> dict[str, int]:
        from .ast import FIELD_SEP

        acc: dict[str, int] = {}
        for s in self.searchers:
            for t, d in zip(s.terms, s.df.tolist()):
                if FIELD_SEP in t:
                    continue  # spell/term listings serve the default field
                acc[t] = acc.get(t, 0) + d
        return acc

    def fetch(self, docids: np.ndarray, cols):
        # group docids by segment base
        out = []
        for s in self.searchers:
            lo, hi = s.base, s.base + s.n
            sel = docids[(docids >= lo) & (docids < hi)]
            if sel.size:
                out.append(s.fetch(sel, cols))
        if not out and self.searchers:
            # zero-row but TYPED: consumers (empty dedup pages, paging past
            # the last group) must see the same column schema as non-empty
            # fetches — the doc table supplies the dtypes
            return self.searchers[0].fetch(np.empty(0, dtype=np.int64), cols)
        return pa.concat_tables(out) if out else None


class TermStatsReader:
    """Driver-side df lookups over the term-sorted ``termstats.parquet``.

    Small tables load whole into sorted arrays (one bisect per term).  Past
    ``max_full_load_rows`` — the 10^12-doc-vocabulary regime where the stats
    table is GBs — the reader bisects PARQUET ROW-GROUP min/max statistics
    instead, loads only the row group(s) a query's terms land in, and caches
    them (LRU): per query cost is O(terms · log groups) + one ~100k-row read
    per cold group, never a whole-vocabulary materialization."""

    def __init__(self, path: str, max_full_load_rows: int = 5_000_000, cache_groups: int = 32):
        import pyarrow.parquet as pq

        self._pf = pq.ParquetFile(path)
        md = self._pf.metadata
        self.full: tuple | None = None
        self._cache_groups = cache_groups
        self.rg_reads = 0  # row groups actually read (bucketed-scan evidence)
        if md.num_rows <= max_full_load_rows:
            t = self._pf.read(columns=["term", "df"])
            self.full = (
                t["term"].to_numpy(zero_copy_only=False),
                t["df"].to_numpy(zero_copy_only=False),
            )
            return
        term_idx = next(
            i for i in range(md.num_columns) if md.schema.column(i).name == "term"
        )
        self._rg_max: list[str] = []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(term_idx).statistics
            self._rg_max.append(st.max)
        self._rg_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _group_arrays(self, gi: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._rg_cache.get(gi)
        if hit is not None:
            return hit
        self.rg_reads += 1  # observability: tests assert O(bucket) reads
        t = self._pf.read_row_group(gi, columns=["term", "df"])
        arrs = (
            t["term"].to_numpy(zero_copy_only=False),
            t["df"].to_numpy(zero_copy_only=False),
        )
        if len(self._rg_cache) >= self._cache_groups:
            _evict_one(self._rg_cache)
        self._rg_cache[gi] = arrs
        return arrs

    def df_of(self, terms: Sequence[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        if self.full is not None:
            tarr, darr = self.full
            pos = np.searchsorted(tarr, np.asarray(terms, dtype=object))
            for t, p in zip(terms, pos.tolist()):
                if p < tarr.size and tarr[p] == t:
                    out[t] = int(darr[p])
            return out
        import bisect

        for t in terms:
            gi = bisect.bisect_left(self._rg_max, t)
            if gi >= len(self._rg_max):
                continue
            tarr, darr = self._group_arrays(gi)
            p = int(np.searchsorted(tarr, t))
            if p < tarr.size and tarr[p] == t:
                out[t] = int(darr[p])
        return out

    def range_stats(self, lo: str, hi: str):
        """Stream (terms StringArray, dfs ndarray) chunks for the term range
        [lo, hi) — the spell-suggest bucket scan.  Reads ONLY the row groups
        whose term range intersects [lo, hi): O(bucket) rows at any
        vocabulary size, never a whole-vocabulary materialization."""
        if self.full is not None:
            tarr, darr = self.full
            a = int(np.searchsorted(tarr, lo, side="left"))
            b = int(np.searchsorted(tarr, hi, side="left"))
            if b > a:
                yield pa.array(tarr[a:b], type=pa.string()), darr[a:b]
            return
        import bisect

        g0 = bisect.bisect_left(self._rg_max, lo)
        g1 = bisect.bisect_left(self._rg_max, hi)
        for gi in range(g0, min(g1 + 1, len(self._rg_max))):
            tarr, darr = self._group_arrays(gi)
            a = int(np.searchsorted(tarr, lo, side="left"))
            b = int(np.searchsorted(tarr, hi, side="left"))
            if b > a:
                yield pa.array(tarr[a:b], type=pa.string()), darr[a:b]

    def all_stats(self) -> dict[str, int]:
        if self.full is not None:
            tarr, darr = self.full
            return {t: int(d) for t, d in zip(tarr.tolist(), darr.tolist())}
        acc: dict[str, int] = {}
        for gi in range(len(self._rg_max)):
            tarr, darr = self._group_arrays(gi)
            acc.update(zip(tarr.tolist(), (int(d) for d in darr.tolist())))
        return acc


@dataclass
class SearchResult:
    """LuceneResponse analog
    (/root/reference/src/org/meresco/lucene/LuceneResponse.java:44-99)."""

    total: int
    hits: pa.Table  # docid, __id__, score, requested stored cols (+dedup extras)
    drilldown_data: dict[str, dict[Any, int]] = field(default_factory=dict)
    total_with_duplicates: int | None = None
    # word -> [(suggestion, df, distance)] when the query carried a
    # suggestionRequest (Lucene.java:334-342)
    suggestions: dict[str, list] | None = None
    # ClusterHit list when the query ran with clustering
    # (clusterTopDocsResponse, Lucene.java:365-414)
    cluster_hits: list | None = None

    def ids(self) -> list[str]:
        return self.hits["__id__"].to_pylist()


def _suggest_mode(mode: str | None) -> str:
    """JsonQueryConverter.suggestModeFromString (:177-187): unknown/absent
    defaults to SUGGEST_WHEN_NOT_IN_INDEX; accepts both the wire strings and
    the engine's short names."""
    m = (mode or "").upper()
    if m in ("SUGGEST_MORE_POPULAR", "MORE_POPULAR"):
        return "MORE_POPULAR"
    if m in ("SUGGEST_ALWAYS", "ALWAYS"):
        return "ALWAYS"
    return "NOT_IN_INDEX"


class IndexSearcher:
    """Actor-pool searcher over a built index directory."""

    # per-doc term-vector provider for clustering:
    # fn(ids: list[str]) -> list[dict[fieldname, Counter]]  (the reference
    # reads stored Lucene term vectors; this engine does not store them, so
    # deployments register a lookup — see cluster_top_docs)
    termvectors_fn = None

    def set_termvector_provider(self, fn) -> None:
        self.termvectors_fn = fn

    def has_stored_termvectors(self) -> bool:
        """True when the index was built with ``store_termvectors=True`` —
        the Lucene storeTermVectors analog; clustering then needs no
        external provider."""
        return bool(self.manifest.config.get("store_termvectors"))

    def termvector_triples(self, docids) -> pa.Table:
        """(docid, term, tf) triples from the stored tv_terms/tv_tfs list
        columns (reader.getTermVector analog) — ONE vectorized list-flatten
        (list_parent_indices + list_flatten, both Arrow C kernels), no
        Python loop over docs or terms."""
        t = self.fetch(np.asarray(docids, dtype=np.int64), ["tv_terms", "tv_tfs"])
        if t is None or len(t) == 0:
            return pa.table(
                {
                    "docid": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        terms = t["tv_terms"].combine_chunks()
        parent = pc.list_parent_indices(terms)
        return pa.table(
            {
                "docid": pc.take(t["docid"], parent),
                "term": pc.list_flatten(terms),
                "tf": pc.list_flatten(t["tv_tfs"].combine_chunks()),
            }
        )

    def termvectors_by_docid(self, docids) -> dict:
        """docid → {text_field: Counter(term→tf)} — the clusterer-boundary
        adapter over :meth:`termvector_triples` (MerescoClusterer.collect
        takes dict[field, Counter]).  The only loop is over run BOUNDARIES
        (one slice per doc, ≤ a page of docs by design); extraction itself
        is the vectorized flatten.  Docs with an empty term vector are
        absent (callers use ``.get(did, {})``)."""
        from collections import Counter

        trip = self.termvector_triples(docids)
        field = self.manifest.config.get("text_col", "content")
        dids = trip["docid"].to_numpy()
        terms = trip["term"].to_pylist()
        tfs = trip["tf"].to_pylist()
        if not len(dids):
            return {}
        bounds = np.concatenate(
            ([0], np.flatnonzero(dids[1:] != dids[:-1]) + 1, [len(dids)])
        )
        return {
            int(dids[lo]): {field: Counter(dict(zip(terms[lo:hi], tfs[lo:hi])))}
            for lo, hi in zip(bounds[:-1], bounds[1:])
        }

    def __init__(
        self,
        index_dir: str,
        num_actors: int | None = None,
        similarity: BM25 | None = None,
        num_cpus: float = 1.0,
        score_f32: bool = True,
    ):
        import ray

        self.index_dir = index_dir
        self._num_actors = num_actors
        self._num_cpus = num_cpus
        self.score_f32 = score_f32
        self._similarity = similarity
        self._cache: dict = {}  # LRU(50) key/score collector cache (ST3)
        # per-instance so tests/operators can tune the dedup merge gate
        self.dedup_driver_max_rows = DEDUP_DRIVER_MAX_ROWS
        self.last_dedup_path: str | None = None
        # diagnostic: partial/candidate rows the last dedup merge pulled to
        # the driver — the distributed paths stay O(page × blocks) no matter
        # the group count (tests pin this)
        self.last_dedup_driver_rows: int | None = None
        self._open(IndexManifest.load(index_dir))

    def _open(self, manifest) -> None:
        import ray

        from ..index.tombstones import tombstone_path

        self.manifest = manifest
        self.sim = self._similarity or BM25(
            k1=self.manifest.config.get("k1", 0.9), b=self.manifest.config.get("b", 0.4)
        )
        # the driver NEVER loads the tombstone set — actors get the parquet
        # path and each builds its bloom-filtered TombstoneSet in __init__,
        # so driver memory stays O(1) at any tombstone count
        tombstones = tombstone_path(self.index_dir)
        self._ts: tuple | None | bool = None  # lazy termstats (reset per version)
        segs = [s.path for s in self.manifest.segments]
        n_act = min(self._num_actors or max(1, len(segs)), max(1, len(segs)))
        assign: list[list[str]] = [[] for _ in range(n_act)]
        for i, p in enumerate(segs):
            assign[i % n_act].append(p)
        # single-threaded actors deliberately: measured on the bench query
        # set, max_concurrency>1 (threaded actors) HALVES qps — the per-query
        # numpy kernels are sub-ms, so thread switching + GIL contention
        # dominates any interleaving win
        Actor = ray.remote(num_cpus=self._num_cpus)(_SegmentActorImpl)
        self.actors = [Actor.remote(self.index_dir, paths, tombstones) for paths in assign if paths]

    def close(self) -> None:
        """Release the segment actors NOW (idempotent).  Handles dying with
        the searcher object normally suffices, but the kill is async and a
        pinned traceback (pytest/hypothesis keeps frame locals of a failing
        example) can hold the handles arbitrarily long — in a small test
        session the stale CPU reservations then deadlock the next actor
        creation.  Short-lived searchers should close explicitly (or use
        the context-manager form)."""
        import ray

        for a in getattr(self, "actors", []):
            try:
                ray.kill(a, no_restart=True)
            except Exception:
                pass
        self.actors = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def refresh(self) -> bool:
        """NRT refresh (SearcherTaxonomyManager.maybeRefreshBlocking analog,
        Lucene.java:899-907): reload the manifest; when its version changed,
        reopen the actors and clear the collector caches
        (cache invalidation per Lucene.java:940-941,993-1013)."""
        m = IndexManifest.load(self.index_dir)
        if m.version == self.manifest.version:
            return False
        self._cache.clear()
        self._open(m)
        return True

    # ---- helpers --------------------------------------------------------
    def _termstats_reader(self):
        """Reader over the build-published global stats table — written
        atomically with every manifest (build/add/delete/merge), so a
        driver-side lookup replaces the per-query df fan-out round and
        every query needs ONE actor round trip."""
        if self._ts is None:
            path = os.path.join(self.index_dir, "termstats.parquet")
            self._ts = TermStatsReader(path) if os.path.exists(path) else False
        return self._ts or None

    def _stats(self, q) -> dict:
        import ray

        terms = sorted(query_terms(q))
        cache_key = ("stats", tuple(terms), self.manifest.version)
        hit = self._cache.get(cache_key)
        if hit is not None:
            return dict(hit)
        dfs: dict[str, int] = {}
        ts = self._termstats_reader() if terms else None
        if ts is not None:
            dfs = ts.df_of(terms)
        elif terms:
            for part in ray.get([a.term_stats.remote(terms) for a in self.actors]):
                for t, d in part.items():
                    dfs[t] = dfs.get(t, 0) + d
        out = {
            "N": self.manifest.num_docs,
            "avgdl": self.manifest.avgdl,
            "df": dfs,
            "f32": self.score_f32,
        }
        sum_dl_fields = self.manifest.metrics.get("sum_dl_fields")
        if sum_dl_fields:
            n = max(self.manifest.num_docs, 1)
            out["avgdl_fields"] = {f: v / n for f, v in sum_dl_fields.items()}
        if len(self._cache) >= 50:
            _evict_one(self._cache)
        self._cache[cache_key] = dict(out)
        return out

    # ---- public API -----------------------------------------------------
    def execute(
        self,
        q,
        start: int = 0,
        stop: int = DEFAULT_STOP,
        sort: list[tuple[str, bool, Any]] | None = None,
        facets: Sequence[str] = (),
        stored_fields: Sequence[str] = (),
        dedup_field: str | None = None,
        dedup_sort_field: str | None = None,
        rank_adjust: dict | None = None,
        join_cols: dict | None = None,
        suggestion_request: dict | None = None,
    ) -> SearchResult:
        """Single-core executeQuery (Lucene.java:253-342): top-k + facets +
        dedup; ``rank_adjust`` blends other-core key scores (J5),
        ``join_cols`` maps {name: (key_col, values_by_key, missing)} for
        cross-core join sort (J6); ``suggestion_request``
        {suggests, count, mode} attaches spell suggestions to the response
        (Lucene.java:334-342, JsonQueryConverter.SuggestionRequest)."""
        import ray

        stats = self._stats(q)
        if rank_adjust:
            stats["rank_adjust"] = rank_adjust
        if join_cols:
            stats["join_cols"] = join_cols
        cols = list(dict.fromkeys(stored_fields))
        if sort:
            for c, _, _ in sort:
                if c != "score" and c not in cols and c not in (join_cols or {}):
                    cols.append(c)
        if dedup_field:
            for c in (dedup_field, dedup_sort_field):
                if c and c not in cols:
                    cols.append(c)

        specs = [(f, "auto") if isinstance(f, str) else tuple(f) for f in facets]
        facet_parts_by_actor: list[list[dict[Any, int]]] | None = None
        if dedup_field:
            page, total, total_with_dups, facet_parts_by_actor = self._execute_dedup(
                q, stats, start, stop, dedup_field, dedup_sort_field, cols, sort, specs
            )
        elif specs:
            # fused single-pass: one fan-out returns top-k AND facet counts,
            # each segment evaluated once (MultiCollector analog — see
            # _SegmentActorImpl.search)
            k = max(stop, 1)
            parts = ray.get(
                [
                    a.search.remote(q, k, self.sim, stats, sort, cols, specs)
                    for a in self.actors
                ]
            )
            merged = pa.concat_tables([t for t, _, _ in parts], promote_options="default")
            total = sum(tot for _, tot, _ in parts)
            hits = self._merge_hits(merged, sort)
            total_with_dups = None
            page = hits.slice(start, max(0, stop - start))
            facet_parts_by_actor = [fp for _, _, fp in parts]
        else:
            k = max(stop, 1)
            parts = ray.get(
                [a.top_k.remote(q, k, self.sim, stats, sort, cols) for a in self.actors]
            )
            merged = pa.concat_tables([t for t, _ in parts], promote_options="default")
            total = sum(tot for _, tot in parts)
            hits = self._merge_hits(merged, sort)
            total_with_dups = None
            page = hits.slice(start, max(0, stop - start))
        drilldown: dict[str, dict[Any, int]] = {}
        if specs:
            for i, (colname, _mode) in enumerate(specs):
                agg: dict[Any, int] = {}
                for per_actor in facet_parts_by_actor:
                    for v, c in per_actor[i].items():
                        agg[v] = agg.get(v, 0) + c
                drilldown[colname] = dict(
                    sorted(agg.items(), key=lambda kv: (-kv[1], str(kv[0])))
                )
        suggestions = None
        if suggestion_request:
            mode = _suggest_mode(suggestion_request.get("mode"))
            cnt = int(suggestion_request.get("count", 10))
            suggestions = {
                w: self.spell_suggest(w, count=cnt, mode=mode)
                for w in suggestion_request.get("suggests", ())
            }
        return SearchResult(
            total=total,
            hits=page,
            drilldown_data=drilldown,
            total_with_duplicates=total_with_dups,
            suggestions=suggestions,
        )

    def _merge_hits(self, merged: pa.Table, sort) -> pa.Table:
        """TopDocs.merge analog: re-sort the union of per-segment top-k by the
        global ordering (score desc / sort fields), docid-asc tiebreak.

        Pure Arrow (no pandas round trip): the merge runs on the driver once
        PER QUERY, so under concurrent clients its GIL time caps qps — the
        former to_pandas/sort_values/from_pandas hop cost ~3 ms per query at
        80 union rows vs ~0.1 ms for pc.sort_indices + take."""
        if not sort:
            idx = pc.sort_indices(
                merged.select(["score", "docid"]),
                sort_keys=[("score", "descending"), ("docid", "ascending")],
            )
            return merged.take(idx)
        key_tbl, sort_keys = _sort_key_columns(merged, sort)
        return merged.take(pc.sort_indices(key_tbl, sort_keys=sort_keys))

    def _execute_dedup(
        self,
        q,
        stats,
        start,
        stop,
        dedup_field,
        dedup_sort_field,
        cols,
        sort=None,
        facet_specs=(),
    ):
        """Exact dedup/grouping (Q11): per-segment per-key aggregates over ALL
        matching docs, merged per key — group rank = best score in group
        (ties min docid), representative = max dedup_sort_field (ties min
        docid), duplicateCount + totalWithDuplicates like
        DeDupFilterSuperCollector.java:66-79.  Unlike the reference there is
        no overfetch-retry loop (Lucene.java:284-320): the aggregate already
        sees every group, so pagination is exact by construction.

        With a ``sort`` spec, groups are ranked by the representatives' sort
        fields (DeDupFilterSuperCollector delegating to a
        TopFieldSuperCollector, DeDupFilterSuperCollector.java:43-258): the
        representatives' sort columns are fetched once (O(groups) small rows)
        and ordered with the same missing-value fills as the non-dedup path.

        Scale: past ``DEDUP_DRIVER_MAX_ROWS`` total partial rows (a
        high-cardinality dedup key at 100 TB) the per-segment partials are
        merged through Ray Data instead of a driver concat — the driver
        payload stays O(page × blocks); see :meth:`_dedup_distributed`
        (score-ranked) and :meth:`_dedup_distributed_fieldsort`
        (representative-field-ranked — the partials carry the local
        representatives' sort values as ``sv_`` columns so no path ever
        fetches O(groups) rows)."""
        import ray

        field_sort = [s for s in (sort or []) if s[0] != "score"]
        sort_cols = tuple(c for c, _, _ in field_sort)
        if facet_specs:
            # fused single-pass (DeDupFilterSuperCollector + FacetSuperCollector
            # under one search): each actor returns (partials, facet dicts) as
            # two objects — the facet dicts stay out of the merge's way
            pairs = [
                a.dedup_and_facets.options(num_returns=2).remote(
                    q,
                    self.sim,
                    stats,
                    dedup_field,
                    dedup_sort_field,
                    sort_cols,
                    list(facet_specs),
                )
                for a in self.actors
            ]
            refs = [p[0] for p in pairs]
            facet_parts_by_actor = ray.get([p[1] for p in pairs])
        else:
            refs = [
                a.dedup_groups.remote(
                    q, self.sim, stats, dedup_field, dedup_sort_field, sort_cols
                )
                for a in self.actors
            ]
            facet_parts_by_actor = None
        nrows = _get_num_rows_task()
        counts = ray.get([nrows.remote(r) for r in refs])
        self.last_dedup_path = "driver"
        if sum(counts) > self.dedup_driver_max_rows:
            self.last_dedup_path = "distributed"
            if field_sort:
                out = self._dedup_distributed_fieldsort(
                    refs, counts, start, stop, dedup_field, cols, field_sort
                )
            else:
                out = self._dedup_distributed(
                    refs, counts, start, stop, dedup_field, cols
                )
            return (*out, facet_parts_by_actor)
        parts = ray.get(refs)
        tbl = pa.concat_tables(parts, promote_options="default")
        self.last_dedup_driver_rows = len(tbl)
        if len(tbl) == 0:
            return self._empty_dedup_page(dedup_field, cols), 0, 0, facet_parts_by_actor
        total_with_dups = int(pc.sum(tbl["cnt"]).as_py())
        g = self._merge_group_partials(tbl)
        if field_sort:
            # rank groups by the REPRESENTATIVES' sort fields — the winning
            # partial row carried the representative's values (sv_ columns)
            g = self._order_groups_by_fields(g, field_sort, sort_cols)
        else:
            g = g.take(
                pc.sort_indices(
                    g.select(["max_score", "rank_docid"]),
                    sort_keys=[("max_score", "descending"), ("rank_docid", "ascending")],
                )
            )
        total = len(g)
        page = self._dedup_page_table(
            g.slice(start, max(0, stop - start)), dedup_field, cols
        )
        return page, total, total_with_dups, facet_parts_by_actor

    def _order_groups_by_fields(self, g: pa.Table, field_sort, sort_cols) -> pa.Table:
        """Order merged group rows (one per key) by the representatives'
        sort fields with `_merge_hits` fill semantics; the sort values live
        in the rows' ``sv_<col>`` columns.  Arrow in/out."""
        key_tbl, sort_keys = _sort_key_columns(
            g,
            field_sort,
            docid_col="repr_docid",
            col_map={c: f"sv_{c}" for c in sort_cols},
        )
        return g.take(pc.sort_indices(key_tbl, sort_keys=sort_keys))

    @staticmethod
    def _merge_group_partials(t: pa.Table) -> pa.Table:
        """Merge per-segment per-key partial rows into one row per key:
        group rank = (max score, min docid), representative = (max
        dedup-sort value, min docid), count = sum.  Any ``sv_`` columns
        (the local representatives' sort-field values) ride along on the
        winning representative row — the global representative's values.

        Pure Arrow: three key-ascending passes (two sorts + one grouped
        sum) each yield exactly one row per key IN KEY ORDER, so the merged
        table is a column zip — no join, no pandas (the former
        sort_values/drop_duplicates/merge chain held the driver GIL for the
        whole ≤500k-row gated payload under concurrent clients).

        Null/NaN dedup keys (a numeric dedup field with missing values —
        segment.col() yields NaN) never form a group, exactly as the former
        pandas path behaved (its merge dropped NaN keys: NaN != NaN); they
        are filtered up front — without this the numpy run-split would
        count each NaN as its own run while group_by collapses them,
        desynchronizing the column zip."""
        valid = _valid_key_mask(t["key"])
        if not pc.all(valid).as_py():
            t = t.filter(valid)

        def winner(val_col, doc_col, cols):
            # NaN best_sort (a null sort value poisons np.maximum.at) must
            # rank WORST on the descending value — Arrow sorts NaN first on
            # descending (pandas sorted it last), so map NaN → -inf
            val = t[val_col]
            if pa.types.is_floating(val.type):
                val = pc.if_else(pc.is_nan(val), pa.scalar(float("-inf")), val)
            keyed = pa.table({"key": t["key"], "v": val, "d": t[doc_col]})
            idx = pc.sort_indices(
                keyed,
                sort_keys=[("key", "ascending"), ("v", "descending"), ("d", "ascending")],
            )
            s = t.take(idx)
            keys = s["key"].to_numpy(zero_copy_only=False)
            first = np.ones(len(keys), dtype=bool)
            first[1:] = keys[1:] != keys[:-1]
            return s.take(pa.array(np.flatnonzero(first))).select(cols)

        rank = winner("max_score", "rank_docid", ["key", "max_score", "rank_docid"])
        sv_cols = [c for c in t.column_names if c.startswith("sv_")]
        rep = winner("best_sort", "repr_docid", ["key", "repr_docid", *sv_cols])
        cnt = t.group_by("key").aggregate([("cnt", "sum")])
        cnt = cnt.take(pc.sort_indices(cnt, sort_keys=[("key", "ascending")]))
        out = {
            "key": rank["key"],
            "max_score": rank["max_score"],
            "rank_docid": rank["rank_docid"],
            "repr_docid": rep["repr_docid"],
        }
        for c in sv_cols:
            out[c] = rep[c]
        out["cnt"] = cnt["cnt_sum"]
        return pa.table(out)

    def _empty_dedup_page(self, dedup_field, cols) -> pa.Table:
        """Zero-row dedup page with the SAME shape every path produces
        (dedup_field, score, duplicateCount, docid, __id__, requested
        stored fields with doc-table dtypes) — paging past the last group
        or matching nothing must not change the hits schema between the
        driver and distributed merges.  ``key`` stays the null type (the
        empty page cannot know the dedup key's dtype), as the former
        pandas-object-empty path produced."""
        g = pa.table(
            {
                "key": pa.array([], type=pa.null()),
                "max_score": pa.array([], type=pa.float64()),
                "cnt": pa.array([], type=pa.int64()),
                "rank_docid": pa.array([], type=pa.int64()),
                "repr_docid": pa.array([], type=pa.int64()),
            }
        )
        return self._dedup_page_table(g, dedup_field, cols)

    def _dedup_page_table(self, page, dedup_field, cols) -> pa.Table:
        """Fetch stored fields for the page's representatives and shape the
        hits table (shared by the driver and distributed merge paths).
        Empty pages carry the SAME columns as non-empty ones — ``fetch``
        returns a typed zero-row table (doc-table dtypes) so ``__id__`` AND
        every requested stored field survive paging past the last group.

        Pure Arrow, order-preserving: the page rows arrive in final rank
        order and ``pa.Table.join`` does not preserve it, so the fetched
        rows are aligned by a sorted-docid ``searchsorted`` gather instead
        of a pandas merge (the same pattern as the `_merge_hits` top-k
        merge — no to_pandas on the per-query path)."""
        tbl: pa.Table = page
        docids = tbl["repr_docid"].to_numpy(zero_copy_only=False).astype(np.int64)
        fetched = self.fetch(
            docids, ["__id__", *[c for c in cols if c != dedup_field]]
        )
        out = pa.table(
            {
                dedup_field: tbl["key"],
                "score": tbl["max_score"],
                "duplicateCount": tbl["cnt"],
                "docid": pa.array(docids, type=pa.int64()),
            }
        )
        if fetched is None:  # no searchers at all
            return out.append_column("__id__", pa.array([None] * len(out), pa.string()))
        f_docids = fetched["docid"].to_numpy(zero_copy_only=False)
        order = np.argsort(f_docids, kind="stable")
        if len(f_docids):
            pos = np.minimum(
                np.searchsorted(f_docids[order], docids), len(f_docids) - 1
            )
            found = f_docids[order][pos] == docids
            idx = pa.array(order[pos], mask=~found, type=pa.int64())
        else:
            idx = pa.array(np.zeros(len(docids), dtype=np.int64), mask=np.ones(len(docids), dtype=bool)) if len(docids) else pa.array([], type=pa.int64())
        aligned = fetched.take(idx)
        for name in aligned.column_names:
            if name != "docid":
                out = out.append_column(name, aligned[name])
        return out

    def _dedup_distributed(self, refs, counts, start, stop, dedup_field, cols):
        """Distributed dedup-group merge (the 100 TB path for Q11): the
        per-segment partial tables stay in the object store and are merged
        with Ray Data —

        1. ONE range-partitioned sort by (key, score desc, docid): each
           key's rows become globally contiguous, best-first — so a block's
           first row per key is that key's GLOBAL argmax whenever the block
           is the first to contain the key.
        2. Per-block (vectorized) first-per-key + top-``stop``: any global
           top-``stop`` key's best row must rank in its own block's
           top-``stop`` (rows above it map to distinct globally-better
           keys), so the per-block candidates cover the page.  Driver
           receives O(stop × blocks) candidate rows, dedups, orders.
        3. Exact ``total`` from per-block (distinct, first_key, last_key)
           stats — sum of distincts minus adjacent-block boundary overlaps
           (a key spanning b blocks is counted b times, overlaps subtract
           b−1).  ``totalWithDuplicates`` is a distributed sum.
        4. The page keys' partial rows are re-collected with a broadcast
           ``is_in`` filter (O(page × segments) rows) and merged with the
           same driver logic as the dense path.

        The driver never holds more than O(page × blocks) rows — the fix
        for the reference-shaped all-groups driver merge, which is a
        driver OOM at high key cardinality (DeDupFilterSuperCollector's
        concurrent map has the same O(groups) footprint in one JVM)."""
        import ray.data as rd

        live = [r for r, c in zip(refs, counts) if c]
        if not live:
            return self._empty_dedup_page(dedup_field, cols), 0, 0
        ds = rd.from_arrow_refs(live)
        total_with_dups = int(ds.sum("cnt") or 0)
        srt = (
            ds.map_batches(_drop_invalid_keys, batch_format="pyarrow")
            .sort(["key", "max_score", "rank_docid"], descending=[False, True, False])
            .materialize()
        )
        k = max(stop, 1)

        def block_candidates(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t.select(["key", "max_score", "rank_docid"])
            ft = _first_per_key(t)
            sc = ft["max_score"].to_numpy(zero_copy_only=False)
            did = ft["rank_docid"].to_numpy(zero_copy_only=False)
            order = np.lexsort((did, -sc))[:k]
            return ft.take(pa.array(np.sort(order))).select(
                ["key", "max_score", "rank_docid"]
            )

        stats_rows, total, _spurious = self._dedup_block_totals(srt)
        import ray

        cand_tables = [
            t
            for t in ray.get(
                srt.map_batches(
                    block_candidates, batch_format="pyarrow", batch_size=None
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        pulled = (
            pa.concat_tables(cand_tables, promote_options="default")
            if cand_tables
            else None
        )
        self.last_dedup_driver_rows = (pulled.num_rows if pulled is not None else 0) + len(stats_rows)
        if pulled is None:
            page_keys = []
        else:
            ranked = pulled.take(
                pc.sort_indices(
                    pulled.select(["max_score", "rank_docid"]),
                    sort_keys=[("max_score", "descending"), ("rank_docid", "ascending")],
                )
            )
            keys = ranked["key"].to_numpy(zero_copy_only=False)
            _, first_idx = np.unique(keys, return_index=True)  # first = best-ranked
            first_idx.sort()
            page_keys = keys[first_idx][start:stop].tolist()
        return self._dedup_collect_page(
            ds,
            page_keys,
            dedup_field,
            cols,
            lambda g: g.take(
                pc.sort_indices(
                    g.select(["max_score", "rank_docid"]),
                    sort_keys=[("max_score", "descending"), ("rank_docid", "ascending")],
                )
            ),
            total,
            total_with_dups,
        )

    @staticmethod
    def _dedup_block_totals(srt):
        """Per-block stats over the key-range-sorted partials → (stats rows
        in key order, exact distinct-key total, spurious first-row uids).

        Total = sum of per-block distinct counts minus adjacent-block
        boundary overlaps (a key spanning b blocks is counted b times;
        overlaps subtract b−1).  A block whose first_key equals the previous
        block's last_key starts MID-RUN: its row 0 is not a run start — its
        unique repr docid identifies the spurious candidate the fieldsort
        path must drop."""

        def block_stats(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "nuniq": pa.array([], pa.int64()),
                        "first_key": t["key"],
                        "last_key": t["key"],
                        "first_uid": t["repr_docid"],
                    }
                )
            keys = t["key"].to_numpy(zero_copy_only=False)
            n = 1 + int(np.count_nonzero(keys[1:] != keys[:-1]))
            return pa.table(
                {
                    "nuniq": pa.array([n], pa.int64()),
                    "first_key": t["key"].slice(0, 1),
                    "last_key": t["key"].slice(len(t) - 1, 1),
                    "first_uid": t["repr_docid"].slice(0, 1),
                }
            )

        stats_rows = srt.map_batches(
            block_stats, batch_format="pyarrow", batch_size=None
        ).take_all()
        stats_rows.sort(key=lambda r: (r["first_key"], r["last_key"]))
        overlaps = [
            b
            for a, b in zip(stats_rows, stats_rows[1:])
            if a["last_key"] == b["first_key"]
        ]
        total = sum(r["nuniq"] for r in stats_rows) - len(overlaps)
        return stats_rows, total, {b["first_uid"] for b in overlaps}

    def _dedup_collect_page(
        self, ds, page_keys, dedup_field, cols, order_groups, total, total_with_dups
    ):
        """Re-collect the page keys' raw partial rows (broadcast ``is_in``,
        O(page × segments)), merge per key with the dense-path logic, order
        with ``order_groups``, fetch stored fields — the shared tail of both
        distributed dedup merges."""
        if not page_keys:
            return self._empty_dedup_page(dedup_field, cols), total, total_with_dups
        key_set = pa.array(page_keys)

        def filt(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["key"], value_set=key_set))

        import ray

        tabs = [
            t
            for t in ray.get(
                ds.map_batches(filt, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows and "key" in t.column_names
        ]
        if not tabs:  # page keys vanished (cannot happen; defensive)
            return self._empty_dedup_page(dedup_field, cols), total, total_with_dups
        small = pa.concat_tables(tabs, promote_options="default")
        g = order_groups(self._merge_group_partials(small))
        return self._dedup_page_table(g, dedup_field, cols), total, total_with_dups

    def _dedup_distributed_fieldsort(
        self, refs, counts, start, stop, dedup_field, cols, field_sort
    ):
        """Distributed dedup-group merge when groups are ranked by the
        REPRESENTATIVES' sort fields (DeDupFilterSuperCollector delegating
        to a TopFieldSuperCollector) — the 100 TB path that replaces the
        former O(groups) driver fetch:

        1. Per-segment partials carry the LOCAL representative's sort values
           (``sv_`` columns, attached at the source where the docs table is
           already in memory), so the GLOBAL representative's values ride on
           whichever partial row wins (max best_sort, tie min repr_docid) —
           no per-group fetch anywhere.
        2. ONE range sort by (key, best_sort desc, repr_docid asc): each
           key's partial rows become contiguous, global-representative
           FIRST.  Per block, first-per-key rows are therefore true global
           representatives — except possibly the block's ROW 0, when the
           key's run spans the preceding block boundary (at most ONE
           spurious row per block, carrying another segment's sort values).
        3. Per block: order the first-per-key rows by the query sort
           (`_sort_key_columns` — identical fills to the driver merge) and
           keep the top-(stop+1): a global top-``stop`` key has < stop
           globally-preceding representatives plus at most 1 spurious row
           above its own representative in any block, so the page is
           covered.  Driver receives O(stop × blocks) rows.
        4. Spurious rows are removed EXACTLY: per-block stats carry
           (first_key, last_key, first row's repr_docid); in key order, a
           block whose first_key equals the previous block's last_key has a
           spurious row 0, identified by its unique repr_docid (a partial
           row's repr docid determines its segment and key).  After the
           filter every candidate is THE global representative of its key.
        5. Exact distinct count from the same block stats (boundary-overlap
           subtraction); page keys' raw partials re-collected via broadcast
           ``is_in`` and merged with the same driver logic as the dense
           path."""
        import ray
        import ray.data as rd

        live = [r for r, c in zip(refs, counts) if c]
        if not live:
            return self._empty_dedup_page(dedup_field, cols), 0, 0
        ds = rd.from_arrow_refs(live)
        total_with_dups = int(ds.sum("cnt") or 0)
        srt = (
            ds.map_batches(_drop_invalid_keys, batch_format="pyarrow")
            .sort(["key", "best_sort", "repr_docid"], descending=[False, True, False])
            .materialize()
        )
        k = max(stop, 1) + 1  # +1: room for the one possible spurious row
        sort_cols = tuple(c for c, _, _ in field_sort)
        col_map = {c: f"sv_{c}" for c in sort_cols}

        def block_candidates(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            ft = _first_per_key(t)
            key_tbl, sort_keys = _sort_key_columns(
                ft, field_sort, docid_col="repr_docid", col_map=col_map
            )
            idx = pc.sort_indices(key_tbl, sort_keys=sort_keys)[:k]
            return ft.take(idx)

        stats_rows, total, spurious_uids = self._dedup_block_totals(srt)
        cand_tables = [
            t
            for t in ray.get(
                srt.map_batches(
                    block_candidates, batch_format="pyarrow", batch_size=None
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        if not cand_tables:
            return self._empty_dedup_page(dedup_field, cols), total, total_with_dups
        cand = pa.concat_tables(cand_tables, promote_options="default")
        self.last_dedup_driver_rows = cand.num_rows + len(stats_rows)
        if spurious_uids:
            keep = ~np.isin(
                cand["repr_docid"].to_numpy(zero_copy_only=False),
                np.fromiter(spurious_uids, dtype=np.int64, count=len(spurious_uids)),
            )
            cand = cand.take(pa.array(np.flatnonzero(keep)))
        key_tbl, sort_keys = _sort_key_columns(
            cand, field_sort, docid_col="repr_docid", col_map=col_map
        )
        ordered = cand.take(pc.sort_indices(key_tbl, sort_keys=sort_keys))
        page_keys = ordered["key"].slice(start, max(0, stop - start)).to_pylist()
        return self._dedup_collect_page(
            ds,
            page_keys,
            dedup_field,
            cols,
            lambda g: self._order_groups_by_fields(g, field_sort, sort_cols),
            total,
            total_with_dups,
        )

    def count(self, q) -> int:
        import ray

        stats = self._stats(q)
        return sum(ray.get([a.count.remote(q, self.sim, stats) for a in self.actors]))

    def matching_ids(self, q) -> list[str]:
        """Every matching ``__id__`` — the delete-by-query id collection
        (Lucene.delete(luceneQuery=...), meresco/lucene/_lucene.py:81-90).
        Scale note: the payload is O(matches); intended for targeted delete
        queries — a match-most query should go through ``merge_index`` with
        an exclusion filter instead."""
        import ray

        stats = self._stats(q)
        out: list[str] = []
        for part in ray.get(
            [a.matching_ids.remote(q, self.sim, stats) for a in self.actors]
        ):
            out.extend(part)
        return out

    def _cached(self, kind: str, q, key_col: str, size: int, compute):
        """keyCollectorCache / scoreCollectorCache analog: LRU(50) keyed by
        (query, key, manifest version) — Lucene.java:737-752,783-791."""
        key = (kind, repr(q), key_col, size, self.manifest.version)
        if key in self._cache:
            return self._cache[key]
        val = compute()
        if len(self._cache) >= 50:
            _evict_one(self._cache)
        self._cache[key] = val
        return val

    def collect_keys(self, q, key_col: str, size: int) -> np.ndarray:
        """KeySuperCollector analog: OR-merged bitset over key values of
        matching docs; returns bool[size]."""
        import ray

        def compute():
            stats = self._stats(q)
            packed = ray.get(
                [a.collect_keys.remote(q, self.sim, stats, key_col, size) for a in self.actors]
            )
            bs = np.zeros(size, dtype=bool)
            for p in packed:
                bs |= np.unpackbits(p, count=size).astype(bool)
            return bs

        return self._cached("keys", q, key_col, size, compute)

    def key_max_scores(self, q, key_col: str, size: int) -> np.ndarray:
        """AggregateScoreSuperCollector input: per-key max score."""
        import ray

        def compute():
            stats = self._stats(q)
            parts = ray.get(
                [a.key_max_scores.remote(q, self.sim, stats, key_col, size) for a in self.actors]
            )
            return np.maximum.reduce(parts) if parts else np.zeros(size)

        return self._cached("scores", q, key_col, size, compute)

    def key_value_array(self, key_col: str, val_col: str, size: int) -> np.ndarray:
        """key → value array over the whole core (last write per key wins, by
        ascending docid order across segments) — the join-sort source map."""
        import ray

        flat = [
            part
            for actor_parts in ray.get(
                [a.key_value_pairs.remote(key_col, val_col) for a in self.actors]
            )
            for part in actor_parts
        ]
        flat.sort(key=lambda p: p[0])  # global docid order = ascending segment base
        keys = np.concatenate([k for _, k, _ in flat]) if flat else np.zeros(0, np.int64)
        vals = np.concatenate([v for _, _, v in flat]) if flat else np.zeros(0)
        sample = vals[0] if vals.size else 0
        if isinstance(sample, str) or vals.dtype == object:
            out = np.full(size, "", dtype=object)
        elif np.issubdtype(vals.dtype, np.integer):
            out = np.full(size, np.iinfo(np.int64).max, dtype=np.int64)
        else:
            out = np.full(size, np.inf, dtype=np.float64)
        ok = (keys >= 0) & (keys < size)
        keys, vals = keys[ok], vals[ok]
        # deterministic "last write per key wins": take the LAST occurrence per
        # key in global docid order (first occurrence in the reversed arrays)
        if keys.size:
            uniq, first_rev = np.unique(keys[::-1], return_index=True)
            out[uniq] = vals[::-1][first_rev]
        return out

    def prefix_search(
        self, prefix: str, limit: int = 10, field: str | None = None
    ) -> list[tuple[str, int]]:
        """prefixSearch / termsForField (Lucene.java:629-666): (term, df) pairs,
        python-side re-sort by count desc (meresco/lucene/_lucene.py:132-142).

        ``field`` scopes the scan like the reference's per-field Terms enum:
        ``None`` (or the default text column, normalized by the facade) scans
        the default-field postings; a registered per-field text column scans
        its ``<field>\\x1f``-keyed dictionary range; a stored keyword/docvalue
        column has no postings — its (value, live-doc count) pairs come from
        a per-segment PREFIX-PUSHED docvalue scan (only the matching range
        ships; the former MatchAll facet shipped every distinct value)."""
        import ray

        cfg = self.manifest.config
        if field is not None and field == cfg.get("text_col"):
            field = None  # default text column = the bare-term dictionary
        if field is not None and field not in cfg.get("text_fields", ()):
            if field not in cfg.get("stored_cols", ()):
                return []  # unknown field: the reference returns no terms
            parts = ray.get(
                [
                    a.stored_prefix_counts.remote(field, prefix, 100_000)
                    for a in self.actors
                ]
            )
            return self._merge_prefix_parts(parts, prefix, limit)

        # scan the full prefix range per segment (cap only as a safety valve):
        # truncating per-segment in term order would drop high-df terms that
        # sort late, breaking the df-desc re-sort (meresco _lucene.py:132-142)
        parts = ray.get(
            [a.prefix_terms.remote(prefix, 100_000, field) for a in self.actors]
        )
        return self._merge_prefix_parts(parts, prefix, limit)

    @staticmethod
    def _merge_prefix_parts(
        parts: list[tuple[dict[str, int], bool]], prefix: str, limit: int
    ) -> list[tuple[str, int]]:
        """Sum per-actor (term → count) partials, df-desc re-sort, cap at
        ``limit`` (meresco _lucene.py:132-142)."""
        acc: dict[str, int] = {}
        for part, truncated in parts:
            if truncated:
                # pathological prefix: a SEGMENT scan stopped at the valve
                # with matching terms left, so the df-desc re-sort below may
                # be missing high-df terms (the per-segment signal — a big
                # MERGED dict alone means nothing was dropped)
                import logging

                logging.getLogger(__name__).warning(
                    "prefix_search(%r): per-segment term cap (100000) hit; "
                    "df-desc ranking may be incomplete",
                    prefix,
                )
            for t, d in part.items():
                acc[t] = acc.get(t, 0) + d
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]

    def all_term_stats(self) -> dict[str, int]:
        """Full (term → df) map, preferring the build-published stats table —
        a local file read instead of shipping every shard's vocabulary
        through the object store (the round-1 scale trap)."""
        ts = self._termstats_reader()
        if ts is not None:
            return ts.all_stats()
        import ray

        acc: dict[str, int] = {}
        for part in ray.get([a.all_terms_stats.remote() for a in self.actors]):
            for t, d in part.items():
                acc[t] = acc.get(t, 0) + d
        return acc

    def num_docs(self) -> int:
        return self.manifest.num_docs

    def fieldnames(self) -> list[str]:
        """fieldnames response (Lucene.java:676-690): the queryable fields —
        the text field plus stored docvalue columns."""
        cfg = self.manifest.config
        return sorted({cfg.get("text_col", "content"), *cfg.get("stored_cols", ())})

    def drilldown_fieldnames(
        self,
        col: str,
        path: Sequence[str] = (),
        limit: int = 100,
        order: str = "taxonomy",
    ) -> list[str]:
        """Taxonomy children listing (drilldownFieldnames, Lucene.java:692-713):
        the distinct child values one level below ``path`` in a hierarchical
        facet column.  The default ``order='taxonomy'`` matches the
        reference exactly — TaxonomyReader.getChildren walks children in
        insertion order, i.e. the order labels were first seen while
        indexing (first-occurrence docid here, which is globally
        ingestion-monotone; deleted docs keep their labels, as a Lucene
        taxonomy never shrinks).  ``order='count'`` opts into this engine's
        most-frequent-first facet convention."""
        if order == "taxonomy":
            import ray

            merged: dict[str, int] = {}
            for part in ray.get(
                [a.facet_children_first.remote(col, tuple(path)) for a in self.actors]
            ):
                for v, d in part.items():
                    if d < merged.get(v, 1 << 62):
                        merged[v] = d
            return [v for v, _ in sorted(merged.items(), key=lambda kv: kv[1])][:limit]
        res = self.execute(MatchAllQ(), stop=0, facets=[(col, "hier")])
        data = res.drilldown_data.get(col, {})
        prefix = ">".join(path) + ">" if path else ""
        out = []
        for k in data:
            if not isinstance(k, str) or not k.startswith(prefix):
                continue
            tail = k[len(prefix):]
            if tail and ">" not in tail:
                out.append(tail)
        return out[:limit]

    def spell_suggest(self, term: str, count: int = 10, mode: str = "NOT_IN_INDEX"):
        """Q14 spell suggestions — DirectSpellChecker semantics: candidates
        share the term's first character (Lucene's minPrefix=1 default), so
        the scan is ONE contiguous range of the term-sorted stats table —
        O(bucket) rows read, never the whole vocabulary (the round-1/2
        driver-OOM trap)."""
        ts = self._termstats_reader()
        if ts is not None:
            from ..suggest.spell import spell_suggest_bucketed

            return spell_suggest_bucketed(ts, term, count=count, mode=mode)
        # no published stats table (dataset-built ad-hoc index): actor-side
        # vocab merge, dict scan — small indexes only
        from ..suggest.spell import spell_suggest as _ss

        return _ss(self.all_term_stats(), term, count=count, mode=mode)

    def cluster_top_docs(
        self,
        q,
        cluster_config,
        termvectors_fn=None,
        start: int = 0,
        stop: int = 10,
    ):
        """clusterTopDocsResponse (Lucene.java:253-269,365-414): overfetch
        ``stop + clusterMoreRecords`` hits, cluster them with a
        ``MerescoClusterer`` (eps interpolated by how far the result set
        falls short of the overfetch), then walk the ranked hits collapsing
        each one into its cluster — the cluster's PageRank-top doc becomes
        the representative, the rest are marked seen and skipped.

        ``termvectors_fn(ids: list[str]) -> list[dict[field, Counter]]``
        supplies per-doc term vectors (the reference reads them from the
        Lucene index; this engine does not store term vectors, so the
        caller provides the lookup — typically a batched stored-field or
        source-table read).  Returns (total_hits, [ClusterHit...]).

        Adaptive retry (Lucene.java:284-320): when cluster collapse consumes
        more hits than the ``clusterMoreRecords`` overfetch covered and the
        page comes back short while more matches exist, the collector stop
        grows ×10 (capped at ``MAX_RETRY_K``) and the search re-runs."""
        from ..cluster import ClusterHit, DocScore, MerescoClusterer

        more = cluster_config.cluster_more_records
        k = stop + more
        while True:
            res = self.execute(q, start=0, stop=k)
            hits = res.hits
            ids = hits["__id__"].to_pylist()[start:]
            docids = hits["docid"].to_pylist()[start:]
            scores = hits["score"].to_pylist()[start:]

            clusterer = MerescoClusterer(
                cluster_config,
                total_hits=res.total,
                slice_size=stop - start,
                interpolate=True,
            )
            by_docid = dict(zip(docids, ids))
            if termvectors_fn is None and self.has_stored_termvectors():
                tvs = self.termvectors_by_docid(docids)
                fts = [tvs.get(did, {}) for did in docids]
            else:
                fts = termvectors_fn(ids)
            for did, ft in zip(docids, fts):
                clusterer.collect(did, ft)
            clusterer.finish()

            out: list[ClusterHit] = []
            seen: set[int] = set()
            count = start
            for did, hid, sc in zip(docids, ids, scores):
                if count >= stop:
                    break
                if did in seen:
                    continue
                cluster = clusterer.cluster(did)
                if cluster is None:
                    seen.add(did)
                    out.append(ClusterHit(id=hid, score=float(sc)))
                else:
                    rep = cluster.top_docs[0].doc_id
                    for ds in cluster.top_docs:
                        seen.add(ds.doc_id)
                    out.append(
                        ClusterHit(
                            id=by_docid.get(rep, hid),
                            score=float(sc),
                            top_docs=[
                                DocScore(by_docid.get(d.doc_id, d.doc_id), d.score)
                                for d in cluster.top_docs
                            ],
                            top_terms=list(cluster.top_terms),
                        )
                    )
                count += 1
            if (
                len(out) >= stop - start
                or len(hits) >= res.total
                or k >= MAX_RETRY_K
            ):
                return res.total, out
            k = min(k * 10, MAX_RETRY_K)

    def more_like_this(self, doc_id: str, text: str, stop: int = 10) -> SearchResult:
        """Q15 similarDocuments (Lucene.java:818-846): OR-query of the doc's
        terms, MUST_NOT itself; caller provides the doc's text (stored
        content is not kept in the index).

        The reference wraps the terms in ``CommonTermsQuery(SHOULD, SHOULD,
        0.1)``.  With BOTH occurs SHOULD (as here) that query builds two
        nested SHOULD boolean groups — high-df terms (df > 0.1·maxDoc) and
        the rest — whose outer sum-of-matching-clause scores equals the flat
        OR's sum in coord-free (7.0+) Lucene BM25; the 0.1 split changes
        ranking only for the MUST lowFreqOccur variants the reference never
        uses.  A flat OR is therefore score- and match-equivalent, not an
        approximation."""
        from ..analysis import tokenize
        from .ast import DocValEqQ, TermQ

        terms = sorted(set(tokenize(text)))
        q = BoolQ(
            should=tuple(TermQ(t) for t in terms),
            must_not=(DocValEqQ("__id__", doc_id),),
        )
        return self.execute(q, stop=stop)

    def fetch(self, docids: Sequence[int], cols: Sequence[str]) -> pa.Table:
        import ray

        arr = np.asarray(docids, dtype=np.int64)
        parts = [
            t
            for t in ray.get([a.fetch.remote(arr, cols) for a in self.actors])
            if t is not None
        ]
        return pa.concat_tables(parts) if parts else None
