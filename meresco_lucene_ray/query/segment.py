"""Per-segment query evaluation (the unit a query actor holds in memory).

One ``SegmentSearcher`` ≈ one Lucene segment + its SuperIndexSearcher slice
(/root/reference/src/org/meresco/lucene/search/SuperIndexSearcher.java:50-111):
it owns the decoded term dictionary and doc table of one doc shard and
evaluates query ASTs densely over its local docid space [0, n).

Evaluation model: every node returns ``(mask: bool[n], scores: float64[n])``.
Dense per-segment accumulation is the vectorized analog of Lucene's
per-segment scorers; n is bounded by the shard size the build chose
(0.5–2 GB of corpus → ≲ a few million docs → a few MB of accumulator),
so this holds at 100 TB scale where segments stay bounded and only their
COUNT grows.  Block-max metadata (blk_last / blk_maxtf) is stored per
posting list for conjunction skipping; the dense path decodes lazily per
query term (only terms the query names are ever decoded).
"""

from __future__ import annotations

import fnmatch
import os
import re
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..index.build import SHARD_BITS
from ..index.codec import decode_postings, decode_positions, delta_decode, varint_decode
from .ast import (
    FIELD_SEP,
    BoolQ,
    DocValEqQ,
    GeoDistanceQ,
    KeyFilterQ,
    MatchAllQ,
    PathPrefixQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    TermQ,
    WildcardQ,
    full_term,
)
from .scorer import BM25, bm25_tf_weight

# string sort sentinels, mirroring fieldregistry.py:168-236 missing-value handling
MISSING_LAST = object()

# below this many matching docs, dense scoring beats the block-max bound
# machinery — the pruned path falls through to exact scoring of the union
BLOCK_MIN_PRUNE = 1024


class SegmentSearcher:
    def __init__(self, seg_dir: str, tombstones=None):
        # ``tombstones``: an index.tombstones.TombstoneSet (bloom-filtered,
        # vectorized — the engine path) or a legacy {id: before_shard} dict
        post = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
        self.terms_arr: pa.Array = post["term"].combine_chunks()
        self.terms: list[str] = post["term"].to_pylist()
        self.term_idx: dict[str, int] = {t: i for i, t in enumerate(self.terms)}
        self.df = post["df"].to_numpy()
        self.cf = post["cf"].to_numpy()
        self._docs_buf = post["docs"].to_pylist()
        self._tfs_buf = post["tfs"].to_pylist()
        self.has_positions = "pos" in post.column_names
        if self.has_positions:
            self._pos_buf = post["pos"].to_pylist()
            self._pos_offs = post["pos_offs"].to_pylist()
        self.has_blocks = "blk_doc_off" in post.column_names
        if self.has_blocks:
            self._blk_last = post["blk_last"].to_pylist()
            self._blk_doc_off = post["blk_doc_off"].to_pylist()
            self._blk_tf_off = post["blk_tf_off"].to_pylist()
            self._blk_maxtf = (
                post["blk_maxtf"].to_pylist() if "blk_maxtf" in post.column_names else None
            )
            self._blk_maxtfdl = (
                post["blk_maxtfdl"].to_pylist() if "blk_maxtfdl" in post.column_names else None
            )
        self.docs = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        self.n = len(self.docs)
        self.docid = self.docs["docid"].to_numpy()
        self.base = int(self.docid[0]) >> SHARD_BITS << SHARD_BITS if self.n else 0
        self.dl = self.docs["dl"].to_numpy().astype(np.float64)
        self._col_cache: dict[str, np.ndarray] = {}
        self._postings_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # tombstone mask (updateDocument/deleteDocument semantics): a doc is
        # dead when its __id__ is tombstoned with before_shard > this shard.
        # Like Lucene, dead docs stop matching immediately but still count in
        # df/avgdl until a merge rewrites the segment.
        self.shard = int(self.docid[0]) >> SHARD_BITS if self.n else 0
        self.live: np.ndarray | None = None
        if tombstones is not None and len(tombstones) and self.n:
            if isinstance(tombstones, dict):  # legacy/test path
                ids = self.docs["__id__"].to_pylist()
                dead = np.fromiter(
                    (tombstones.get(i, -1) > self.shard for i in ids),
                    dtype=bool,
                    count=len(ids),
                )
                if not dead.any():
                    dead = None
            else:  # TombstoneSet: bloom pre-filter + vectorized exact probe
                dead = tombstones.deleted_mask(self.docs["__id__"], self.shard)
            if dead is not None and dead.any():
                self.live = ~dead

    def _apply_live(self, mask: np.ndarray) -> np.ndarray:
        return mask & self.live if self.live is not None else mask

    # ---- per-field scoring inputs (field-scoped BM25) --------------------
    def _dl_for(self, field: str | None) -> np.ndarray:
        """The doc-length array a (field, term) posting scores against:
        the default field's ``dl`` or the field's own ``__dl__<field>``
        column (per-field norms, DocumentStringToDocument.java:94-100)."""
        if not field:
            return self.dl
        key = f"__fdl__{field}"
        arr = self._col_cache.get(key)
        if arr is None:
            col = f"__dl__{field}"
            if col not in self.docs.column_names:
                raise KeyError(
                    f"field {field!r} was not indexed as a text field "
                    f"(no {col} column; IndexConfig.text_fields)"
                )
            arr = self.docs[col].to_numpy(zero_copy_only=False).astype(np.float64)
            self._col_cache[key] = arr
        return arr

    @staticmethod
    def _avgdl_for(field: str | None, stats: dict) -> float:
        if not field:
            return stats["avgdl"]
        return stats.get("avgdl_fields", {}).get(field, stats["avgdl"])

    # ---- raw access -----------------------------------------------------
    def col(self, name: str) -> np.ndarray:
        """Stored/docvalue column as numpy (string cols become object arrays)."""
        arr = self._col_cache.get(name)
        if arr is None:
            a = self.docs[name]
            if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
                arr = np.asarray(a.to_pylist(), dtype=object)
            else:
                arr = a.to_numpy(zero_copy_only=False)
            self._col_cache[name] = arr
        return arr

    def postings_local(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(local doc indices int64, tf uint64) for a term; cached per searcher."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            return hit
        ti = self.term_idx.get(term)
        if ti is None:
            return None
        docids, tfs = decode_postings(self._docs_buf[ti], self._tfs_buf[ti])
        local = (docids - np.uint64(self.base)).astype(np.int64)
        self._postings_cache[term] = (local, tfs)
        return local, tfs

    def positions_for(self, term: str, posting_rank: int) -> np.ndarray:
        ti = self.term_idx[term]
        offs = self._pos_offs[ti]
        buf = self._pos_buf[ti]
        return decode_positions(buf, int(offs[posting_rank]), int(offs[posting_rank + 1]))

    def positions_bulk(self, term: str, posting_ranks: np.ndarray, tfs: np.ndarray):
        """Decode positions for MANY postings of one term in one vectorized
        pass.  Returns (flat_positions uint64, group_starts int64) where
        group i spans [starts[i], starts[i] + tfs[i])."""
        ti = self.term_idx[term]
        offs = np.asarray(self._pos_offs[ti], dtype=np.int64)
        buf = self._pos_buf[ti]
        spans = [buf[offs[r] : offs[r + 1]] for r in posting_ranks.tolist()]
        joined = b"".join(spans)
        gaps = varint_decode(joined)
        lengths = tfs.astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        # grouped delta-decode: cumsum with reset at group starts
        cs = np.cumsum(gaps, dtype=np.uint64)
        base = cs[starts] - gaps[starts]
        flat = cs - np.repeat(base, lengths)
        return flat, starts

    def postings_for_candidates(
        self, term: str, cand_local_sorted: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Block-skip read: decode ONLY the blocks that can contain the given
        candidate docids (blk_last binary search), per the block-max skip
        design.  Falls back to a full decode when most blocks are needed
        anyway or block offsets are absent.  Returns (local_idx, tfs) —
        a SUBSET of the term's postings covering all candidates."""
        ti = self.term_idx.get(term)
        if ti is None:
            return None
        blk_last = np.asarray(self._blk_last[ti], dtype=np.int64) if self.has_blocks else None
        if blk_last is None or blk_last.size <= 2:
            return self.postings_local(term)
        cand_global = (cand_local_sorted + self.base).astype(np.int64)
        bidx = np.unique(np.searchsorted(blk_last, cand_global))
        bidx = bidx[bidx < blk_last.size]
        if bidx.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
        if bidx.size * 2 >= blk_last.size:
            return self.postings_local(term)
        from ..index.codec import BLOCK_SIZE

        doffs = np.asarray(self._blk_doc_off[ti], dtype=np.int64)
        toffs = np.asarray(self._blk_tf_off[ti], dtype=np.int64)
        dbuf, tbuf = self._docs_buf[ti], self._tfs_buf[ti]
        dspans = b"".join(dbuf[doffs[b] : doffs[b + 1]] for b in bidx.tolist())
        tspans = b"".join(tbuf[toffs[b] : toffs[b + 1]] for b in bidx.tolist())
        gaps = varint_decode(dspans)
        df = int(self.df[ti])
        blk_sizes = np.minimum((bidx + 1) * BLOCK_SIZE, df) - bidx * BLOCK_SIZE
        starts = np.concatenate(([0], np.cumsum(blk_sizes)[:-1])).astype(np.int64)
        cs = np.cumsum(gaps, dtype=np.uint64)
        base = cs[starts] - gaps[starts]
        docids = cs - np.repeat(base, blk_sizes)
        tfs = varint_decode(tspans)
        local = (docids - np.uint64(self.base)).astype(np.int64)
        return local, tfs

    def term_stats(self, terms: Sequence[str]) -> dict[str, int]:
        return {t: int(self.df[self.term_idx[t]]) for t in terms if t in self.term_idx}

    # ---- evaluation -----------------------------------------------------
    def eval(self, q, sim: BM25, stats: dict) -> tuple[np.ndarray, np.ndarray]:
        n = self.n
        N, avgdl, dfs = stats["N"], stats["avgdl"], stats["df"]
        if isinstance(q, MatchAllQ):
            return np.ones(n, dtype=bool), np.full(n, q.boost)
        if isinstance(q, TermQ):
            mask = np.zeros(n, dtype=bool)
            scores = np.zeros(n)
            key = full_term(q.field, q.term)
            p = self.postings_local(key)
            if p is not None:
                idx, tf = p
                mask[idx] = True
                scores[idx] = sim.score(
                    tf,
                    self._dl_for(q.field)[idx],
                    N,
                    dfs.get(key, 0),
                    self._avgdl_for(q.field, stats),
                    q.boost,
                )
            return mask, scores
        if isinstance(q, PhraseQ):
            return self._eval_phrase(q, sim, stats)
        if isinstance(q, (PrefixQ, WildcardQ)):
            mask = np.zeros(n, dtype=bool)
            for t in self._expand_multiterm(q):
                p = self.postings_local(t)
                if p is not None:
                    mask[p[0]] = True
            scores = np.where(mask, q.boost, 0.0)
            return mask, scores
        if isinstance(q, RangeQ):
            vals = self.col(q.col)
            mask = _range_mask(vals, q)
            return mask, np.where(mask, q.boost, 0.0)
        if isinstance(q, DocValEqQ):
            vals = self.col(q.col)
            mask = vals == q.value
            return mask, np.where(mask, q.boost, 0.0)
        if isinstance(q, PathPrefixQ):
            level = self._facet_level_col(q.col, len(q.path))
            mask = level == ">".join(q.path)
            return mask, np.where(mask, q.boost, 0.0)
        if isinstance(q, GeoDistanceQ):
            lat = np.radians(self.col(q.lat_col).astype(np.float64))
            lon = np.radians(self.col(q.lon_col).astype(np.float64))
            qlat, qlon = np.radians(q.lat), np.radians(q.lon)
            a = (
                np.sin((lat - qlat) / 2) ** 2
                + np.cos(lat) * np.cos(qlat) * np.sin((lon - qlon) / 2) ** 2
            )
            dist_m = 2 * 6371000.0 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
            mask = dist_m <= q.radius_m
            return mask, np.where(mask, q.boost, 0.0)
        if isinstance(q, KeyFilterQ):
            keys = self.col(q.key_col).astype(np.int64)
            bs = np.asarray(q.bitset, dtype=bool)
            valid = (keys >= 0) & (keys < bs.size)
            mask = np.zeros(n, dtype=bool)
            mask[valid] = bs[keys[valid]]
            if q.inverted:
                mask = ~mask
            return mask, np.zeros(n)
        if isinstance(q, BoolQ):
            return self._eval_bool(q, sim, stats)
        raise TypeError(f"unsupported query node: {type(q)!r}")

    def _expand_multiterm(self, q) -> list[str]:
        """Expand a prefix/wildcard to the matching FULL dictionary keys —
        a field-scoped query expands within its "<field>\\x1f" key range
        (still one contiguous bisectable slice of the sorted dictionary)."""
        if isinstance(q, PrefixQ):
            # term dict is sorted → binary-searchable range scan
            import bisect

            key_prefix = full_term(q.field, q.prefix)
            lo = bisect.bisect_left(self.terms, key_prefix)
            out = []
            for i in range(lo, len(self.terms)):
                if not self.terms[i].startswith(key_prefix):
                    break
                out.append(self.terms[i])
            return out
        # vectorized wildcard expansion: anchored RE2 over the Arrow term
        # dictionary (one C pass), not a Python loop over the vocabulary
        import pyarrow.compute as pc

        rx = fnmatch.translate(q.pattern)
        if rx.endswith(r"\Z"):
            rx = rx[:-2] + "$"
        if q.field:
            rx = re.escape(q.field + FIELD_SEP) + rx
        mask = pc.match_substring_regex(self.terms_arr, "^" + rx)
        return self.terms_arr.filter(mask).to_pylist()

    def _eval_phrase(self, q: PhraseQ, sim: BM25, stats: dict):
        n = self.n
        mask = np.zeros(n, dtype=bool)
        scores = np.zeros(n)
        if not q.terms:
            # analyzed-away phrase (e.g. ':;+') matches nothing, mirroring an
            # empty Lucene PhraseQuery (queryexpressiontolucenequerydict.py:225-228)
            return mask, scores
        keys = [full_term(q.field, t) for t in q.terms]
        plists = []
        for t in keys:
            p = self.postings_local(t)
            if p is None:
                return mask, scores
            plists.append(p[0])
        cand = plists[0]
        for nxt in plists[1:]:
            cand = cand[np.isin(cand, nxt, assume_unique=True)]
        if cand.size == 0:
            return mask, scores
        if not self.has_positions:
            raise RuntimeError("phrase query requires an index built with store_positions=True")
        # vectorized adjacency check across ALL candidates at once:
        # tag each position with its candidate ordinal (key = cand*2^32+pos),
        # then keep keys whose successor exists in the next term's key set
        ranks = [np.searchsorted(pl, cand) for pl in plists]
        SHIFT = np.uint64(32)
        tf_arrays = []
        for t, pl in zip(keys, plists):
            p = self.postings_local(t)
            tf_arrays.append(p[1][np.searchsorted(p[0], cand)])
        flat0, starts0 = self.positions_bulk(keys[0], ranks[0], tf_arrays[0])
        cand_ord0 = np.repeat(
            np.arange(cand.size, dtype=np.uint64), tf_arrays[0].astype(np.int64)
        )
        live_keys = (cand_ord0 << SHIFT) | flat0
        live_ord = cand_ord0
        for k in range(1, len(q.terms)):
            flatk, _ = self.positions_bulk(keys[k], ranks[k], tf_arrays[k])
            ordk = np.repeat(
                np.arange(cand.size, dtype=np.uint64), tf_arrays[k].astype(np.int64)
            )
            keysk = (ordk << SHIFT) | flatk
            keep = np.isin(live_keys + np.uint64(k), keysk, assume_unique=True)
            live_keys = live_keys[keep]
            live_ord = live_ord[keep]
            if live_keys.size == 0:
                break
        freqs = np.bincount(live_ord.astype(np.int64), minlength=cand.size)
        hit = freqs > 0
        idx = cand[hit]
        mask[idx] = True
        # Lucene PhraseQuery: idf = sum of member-term idfs, tf = phrase freq
        N, dfs = stats["N"], stats["df"]
        avgdl = self._avgdl_for(q.field, stats)
        fdl = self._dl_for(q.field)
        idf_sum = float(
            sum(np.log(1.0 + (N - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5)) for t in keys)
        )
        from .scorer import bm25_tf_weight

        if isinstance(sim, BM25):
            scores[idx] = q.boost * idf_sum * bm25_tf_weight(
                freqs[hit], fdl[idx], avgdl, sim.k1, sim.b
            )
        else:
            scores[idx] = sim.score(freqs[hit], fdl[idx], N, 0, avgdl, q.boost)
        return mask, scores

    def _eval_and_terms(self, term_qs, sim: BM25, stats: dict):
        """Conjunctive fast path: decode the rarest term fully, then read only
        the BLOCKS of the other terms that can contain those candidates
        (blk_last skip), intersecting as we go — document-at-a-time with
        block skipping per the north-star design.  Scores are accumulated in
        CLAUSE order so results are bit-identical to the dense path."""
        n = self.n
        infos = []
        for tq in term_qs:
            key = full_term(tq.field, tq.term)
            ti = self.term_idx.get(key)
            if ti is None:
                return np.zeros(n, dtype=bool), np.zeros(n)
            infos.append((tq, int(self.df[ti]), key))
        order = sorted(range(len(infos)), key=lambda i: infos[i][1])
        p = self.postings_local(infos[order[0]][2])
        cand, _ = p
        tf_by_clause: dict[int, np.ndarray] = {order[0]: p[1]}
        for oi in order[1:]:
            sub = self.postings_for_candidates(infos[oi][2], cand)
            sub_local, sub_tf = sub
            pos = np.searchsorted(sub_local, cand)
            ok = (pos < sub_local.size) & (
                sub_local[np.minimum(pos, max(sub_local.size - 1, 0))] == cand
            ) if sub_local.size else np.zeros(cand.size, dtype=bool)
            cand = cand[ok]
            for k in tf_by_clause:
                tf_by_clause[k] = tf_by_clause[k][ok]
            tf_by_clause[oi] = sub_tf[pos[ok]] if sub_local.size else sub_tf[:0]
            if cand.size == 0:
                break
        mask = np.zeros(n, dtype=bool)
        scores = np.zeros(n)
        if cand.size:
            mask[cand] = True
            N, dfs = stats["N"], stats["df"]
            acc = np.zeros(cand.size)
            for ci, (tq, _, key) in enumerate(infos):  # clause order, like the dense path
                acc += sim.score(
                    tf_by_clause[ci],
                    self._dl_for(tq.field)[cand],
                    N,
                    dfs.get(key, 0),
                    self._avgdl_for(tq.field, stats),
                    tq.boost,
                )
            scores[cand] = acc
        return mask, scores

    def _eval_bool(self, q: BoolQ, sim: BM25, stats: dict):
        n = self.n
        mask = None
        scores = np.zeros(n)
        if not (q.must or q.should or q.filter):
            # a BooleanQuery without positive clauses matches nothing in
            # Lucene (incl. the all-clauses-dropped empty boolean)
            return np.zeros(n, dtype=bool), scores
        if (
            len(q.must) >= 2
            and all(isinstance(c, TermQ) for c in q.must)
            and getattr(self, "has_blocks", False)
        ):
            mask, scores = self._eval_and_terms(q.must, sim, stats)
        else:
            for sub in q.must:
                m, s = self.eval(sub, sim, stats)
                mask = m if mask is None else (mask & m)
                scores += s
        for sub in q.filter:
            m, _ = self.eval(sub, sim, stats)
            mask = m if mask is None else (mask & m)
        should_mask = None
        for sub in q.should:
            m, s = self.eval(sub, sim, stats)
            should_mask = m if should_mask is None else (should_mask | m)
            scores += s
        if mask is None:
            mask = should_mask if should_mask is not None else np.ones(n, dtype=bool)
        for sub in q.must_not:
            m, _ = self.eval(sub, sim, stats)
            mask &= ~m
        scores = np.where(mask, scores * q.boost, 0.0)
        return mask, scores

    # ---- block-max pruned disjunction -----------------------------------
    def _wand_eligible(self, q, sim, stats, sort_spec) -> list | None:
        """Return the TermQ clause list when the block-max pruned top-k path
        applies (pure disjunction of positively-boosted terms, BM25, default
        ordering, block metadata present), else None."""
        if (
            sort_spec is not None
            or stats.get("rank_adjust") is not None
            or stats.get("join_cols")
            or not isinstance(sim, BM25)
            or not self.has_blocks
            or getattr(self, "_blk_maxtf", None) is None
        ):
            return None
        # field-scoped clauses use per-field dl/avgdl — the block bounds are
        # computed against the default field's norms, so hand those to the
        # dense path (correctness first; field-scoped block metadata would
        # need per-field blk_maxtfdl)
        if isinstance(q, TermQ) and q.boost > 0 and q.field is None:
            return [q]
        if (
            isinstance(q, BoolQ)
            and q.should
            and not q.must
            and not q.filter
            and not q.must_not
            and q.boost == 1.0
            and all(
                isinstance(c, TermQ) and c.boost > 0 and c.field is None
                for c in q.should
            )
        ):
            return list(q.should)
        return None

    def _top_k_or_pruned(self, term_qs, k, sim: BM25, stats: dict, cols) -> pa.Table:
        """Block-max pruned disjunctive top-k (the MaxScore / block-max-WAND
        family, vectorized at docid-range granularity) — the north-star's
        'block-max WAND pruning' over the blk_last/blk_maxtf metadata
        ``index/codec.py`` writes.

        The docid axis is cut into CELLS at the union of all terms' block
        boundaries; each cell's score upper bound is the sum of the covering
        blocks' bounds (boost · idf · tf_weight(blk_maxtf, min dl)).  Cells
        are scored exactly in descending-bound order until the next bound
        cannot reach the current k-th score — every surviving doc is scored
        with the SAME clause-order float accumulation as the dense path, so
        results (scores, docid tiebreaks, totals) are bit-identical."""
        N, avgdl, dfs = stats["N"], stats["avgdl"], stats["df"]
        f32 = stats.get("f32", True)
        posts = []  # (tq, local docids, tfs) in CLAUSE order
        for tq in term_qs:
            p = self.postings_local(tq.term)
            if p is not None:
                posts.append((tq, p[0], p[1]))
        empty = self._hits_table(np.empty(0, dtype=np.int64), np.zeros(0), cols, 0)
        if not posts:
            return empty

        def compute_union() -> np.ndarray:
            u = np.unique(np.concatenate([pl for _, pl, _ in posts]))
            if self.live is not None:
                u = u[self.live[u]]
            return u

        def score_exact(cand: np.ndarray) -> np.ndarray:
            acc = np.zeros(cand.size)
            for tq, pl, tf in posts:  # clause order == dense accumulation order
                pos = np.searchsorted(pl, cand)
                ok = pos < pl.size
                if ok.any():
                    ok[ok] = pl[pos[ok]] == cand[ok]
                if ok.any():
                    acc[ok] += sim.score(
                        tf[pos[ok]], self.dl[cand[ok]], N, dfs.get(tq.term, 0), avgdl, tq.boost
                    )
            return acc

        def finalize(docs: np.ndarray, sc: np.ndarray, total: int) -> pa.Table:
            order = np.lexsort((docs, -sc))[:k]
            sel = docs[order]
            return self._hits_table(sel, sc[order], cols, total)

        est_total = sum(pl.size for _, pl, _ in posts)
        if est_total <= max(4 * k, BLOCK_MIN_PRUNE):
            # small result sets: score the union directly (postings already
            # decoded), skipping the bound machinery
            union = compute_union()
            if union.size == 0:
                return empty
            sc = score_exact(union)
            if f32:
                sc = sc.astype(np.float32).astype(np.float64)
            return finalize(union, sc, int(union.size))

        # ---- per-cell upper bounds
        dl_min = getattr(self, "_dl_min", None)
        if dl_min is None:
            dl_min = self._dl_min = float(self.dl.min()) if self.n else 1.0
        c1 = sim.k1 * (1.0 - sim.b)
        c2 = sim.k1 * sim.b / avgdl
        blk_lasts, blk_ws = [], []
        for tq, _, _ in posts:
            ti = self.term_idx[tq.term]
            bl = np.asarray(self._blk_last[ti], dtype=np.int64)
            mt = np.asarray(self._blk_maxtf[ti], dtype=np.float64)
            if self._blk_maxtfdl is not None:
                # tight bound: tf_weight = 1/(1 + c1/tf + c2·dl/tf) maximized
                # independently by the block's max tf and max tf/dl
                mr = np.asarray(self._blk_maxtfdl[ti], dtype=np.float64)
                ub_tfw = 1.0 / (1.0 + c1 / np.maximum(mt, 1e-30) + c2 / np.maximum(mr, 1e-30))
            else:
                ub_tfw = bm25_tf_weight(mt, dl_min, avgdl, sim.k1, sim.b)
            w = tq.boost * sim.idf(N, dfs.get(tq.term, 0)) * ub_tfw
            blk_lasts.append(bl)
            blk_ws.append(np.asarray(w, dtype=np.float64))
        cell_ends = np.unique(np.concatenate(blk_lasts))  # global docids
        ncells = cell_ends.size
        cell_ub = np.zeros(ncells)
        for bl, w in zip(blk_lasts, blk_ws):
            b = np.searchsorted(bl, cell_ends, side="left")
            cov = b < bl.size
            cell_ub[cov] += w[b[cov]]
        # flatness gate (metadata only, nothing scored yet): pruning can only
        # pay off when a sizable share of cells is bounded well below the top
        # cells; a flat bound profile (every block holds a near-max-impact
        # doc) means the dense scatter path wins — bail before any setup
        hi = float(np.percentile(cell_ub, 99)) if ncells else 0.0
        if ncells < 16 or (cell_ub < 0.5 * hi).mean() < 0.3:
            return None
        order = np.argsort(-cell_ub, kind="stable")
        # cell id of each posting, per term (one searchsorted pass each)
        cell_of = [
            np.searchsorted(cell_ends, (pl + self.base).astype(np.int64), side="left")
            for _, pl, _ in posts
        ]

        scored_docs: list[np.ndarray] = []
        scored_sc: list[np.ndarray] = []
        n_scored = 0
        theta = -np.inf
        i = 0
        chunk = max(8, (2 * k) // 128 + 1)
        sel_flag = np.zeros(ncells, dtype=bool)

        def score_cells(take: np.ndarray):
            nonlocal n_scored
            sel_flag[:] = False
            sel_flag[take] = True
            parts = [pl[sel_flag[co]] for (_, pl, _), co in zip(posts, cell_of)]
            cand = np.unique(np.concatenate(parts))
            if self.live is not None:
                cand = cand[self.live[cand]]
            if cand.size == 0:
                return
            sc = score_exact(cand)
            if f32:
                sc = sc.astype(np.float32).astype(np.float64)
            scored_docs.append(cand)
            scored_sc.append(sc)
            n_scored += cand.size

        while i < order.size:
            if n_scored >= k:
                remaining = order[i:]
                keep = cell_ub[remaining] >= theta * (1.0 - 1e-6)
                if not keep.any():
                    break  # no remaining cell can reach the k-th score
                if keep.mean() > 0.5:
                    # bounds are flat on this segment/query (uniform score
                    # distribution) — hand back to the dense path, whose
                    # scatter-accumulate beats per-candidate searchsorted
                    # when most docs must be scored anyway
                    return None
                order = remaining[keep]
                i = 0
            take = order[i : i + chunk]
            i += chunk
            chunk *= 2
            score_cells(take)
            if n_scored >= k:
                allsc = np.concatenate(scored_sc)
                theta = float(np.partition(allsc, allsc.size - k)[allsc.size - k])
        union = compute_union()
        if not scored_docs:
            return empty
        return finalize(
            np.concatenate(scored_docs), np.concatenate(scored_sc), int(union.size)
        )

    # ---- collectors -----------------------------------------------------
    def top_k(
        self,
        q,
        k: int,
        sim: BM25,
        stats: dict,
        sort_spec: list[tuple[str, bool, Any]] | None = None,
        cols: Sequence[str] = (),
        _precomputed: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> pa.Table:
        """Per-segment top-k (TopScoreDocSuperCollector / TopFieldSuperCollector
        analog). Ties broken by docid asc for determinism.

        ``_precomputed``: an already-live-filtered (mask, scores) pair from
        one shared ``eval`` pass — the fused top-k+facets path
        (MultiSuperCollector analog) evaluates the query ONCE per segment
        and feeds both collectors; skips the WAND fast path (facet counting
        needs the full match mask anyway)."""
        if _precomputed is not None:
            mask, scores = _precomputed
        else:
            wand_terms = self._wand_eligible(q, sim, stats, sort_spec)
            if wand_terms is not None:
                pruned = self._top_k_or_pruned(wand_terms, k, sim, stats, cols)
                if pruned is not None:
                    return pruned
                # bounds not discriminative on this segment/query → dense path
            mask, scores = self.eval(q, sim, stats)
            mask = self._apply_live(mask)
        adj = stats.get("rank_adjust")
        if adj is not None:
            # AggregateScoreSuperCollector blend (J5): newScore =
            # (1−r)·ownScore + r·∏(1+otherScore(key))
            # (/root/reference/src/org/meresco/lucene/search/AggregateScoreSuperCollector.java:39-165)
            # each rank array reads through ITS OWN result-side key column
            prod = np.ones(self.n)
            for key_col, arr in adj["items"]:
                keys = self.col(key_col).astype(np.int64)
                ok = (keys >= 0) & (keys < arr.size)
                factor = np.ones(self.n)
                factor[ok] = 1.0 + arr[keys[ok]]
                prod *= factor
            r = adj["ratio"]
            scores = np.where(mask, (1.0 - r) * scores + r * prod, 0.0)
        # Lucene reports float32 scores (golden 0.13076457381248474 is the
        # float32 rounding of the double BM25 value) — quantize BEFORE ranking
        # so tie-breaks match the reference.  stats["f32"]=False keeps full
        # doubles (used by the SQL-oracle-checked entry points).
        if stats.get("f32", True):
            scores = scores.astype(np.float32).astype(np.float64)
        self._join_cols = stats.get("join_cols") or {}
        idx = np.flatnonzero(mask)
        total = idx.size
        if total == 0:
            return self._hits_table(idx, np.zeros(0), cols, total)
        extra_cols = {}
        if sort_spec:
            keys = []
            for colname, desc, missing in reversed(sort_spec):
                raw = self._sort_col(colname, scores)
                if colname in getattr(self, "_join_cols", {}):
                    extra_cols[colname] = raw  # carry joined values for the global merge
                v = _sortable(raw, missing)
                keys.append(_neg_for_desc(v[idx], desc))
            keys.insert(0, idx)  # final tiebreak docid asc
            order = np.lexsort(keys)
        else:
            order = np.lexsort((idx, -scores[idx]))
        sel = idx[order[:k]]
        t = self._hits_table(sel, scores[sel], cols, total)
        for name, raw in extra_cols.items():
            t = t.append_column(name, pa.array(raw[sel].tolist()))
        return t

    def _sort_col(self, name: str, scores: np.ndarray) -> np.ndarray:
        if name == "score":
            return scores
        jc = getattr(self, "_join_cols", {})
        if name in jc:
            # join sort (J6): map each doc's key through the broadcast
            # key→sort_value array from the other core
            key_col, values, missing = jc[name]
            keys = self.col(key_col).astype(np.int64)
            out = np.full(self.n, missing, dtype=np.asarray(values).dtype)
            ok = (keys >= 0) & (keys < len(values))
            out[ok] = np.asarray(values)[keys[ok]]
            return out
        return self.col(name)

    def _hits_table(self, idx: np.ndarray, scores: np.ndarray, cols, total: int) -> pa.Table:
        data = {
            "docid": pa.array(self.docid[idx]),
            "__id__": self.docs["__id__"].take(pa.array(idx)).combine_chunks()
            if idx.size
            else pa.array([], type=pa.string()),
            "score": pa.array(scores, type=pa.float64()),
        }
        for c in cols:
            data[c] = self.docs[c].take(pa.array(idx)).combine_chunks() if idx.size else pa.array(
                [], type=self.docs[c].type
            )
        t = pa.table(data)
        return t.replace_schema_metadata({b"total": str(total).encode()})

    def count(self, q, sim: BM25, stats: dict) -> int:
        mask, _ = self.eval(q, sim, stats)
        return int(self._apply_live(mask).sum())

    def matching_ids(self, q, sim: BM25, stats: dict) -> list[str]:
        """``__id__`` of every live matching doc (deleteDocuments(Query)
        support, Lucene.java delete-by-query path)."""
        mask, _ = self.eval(q, sim, stats)
        mask = self._apply_live(mask)
        if not mask.any():
            return []
        return (
            self.docs["__id__"].filter(pa.array(mask)).to_pylist()
        )

    def _facet_level_col(self, col: str, depth: int) -> np.ndarray:
        """For a list<string> facet-path column: the '>'-joined prefix of
        length ``depth`` per doc (None when the path is shorter) — cached,
        the CachedOrdinalsReader analog (Lucene.java:586-595)."""
        cache = self._col_cache.setdefault(f"__facet_{col}", {})
        if depth not in cache:
            vals = self.col(col)
            cache[depth] = np.asarray(
                [
                    ">".join(v[:depth]) if isinstance(v, (list, np.ndarray)) and len(v) >= depth else None
                    for v in vals
                ],
                dtype=object,
            )
        return cache[depth]

    def _facet_level_arrow(self, col: str, depth: int) -> pa.Array:
        """Arrow string view of ``_facet_level_col`` — cached per (col,
        depth) so prefix pushdown scans run in C kernels per query."""
        cache = self._col_cache.setdefault(f"__facet_arrow_{col}", {})
        if depth not in cache:
            cache[depth] = pa.array(
                self._facet_level_col(col, depth), type=pa.string()
            )
        return cache[depth]

    def facet_counts(
        self,
        q,
        sim: BM25,
        stats: dict,
        col: str,
        mode: str = "auto",
        _mask: np.ndarray | None = None,
    ) -> dict[Any, int]:
        """Per-segment facet term counts (FacetSuperCollector analog:
        per-slice count maps merged by the engine).

        Scalar columns count values; list<string> columns count either each
        element (mode='multi') or every hierarchical '>'-joined path prefix
        with rollup (mode='hier' — MerescoTaxonomyFacetCounts.java:60-212).
        mode='auto' treats lists as hierarchical paths.

        ``_mask``: an already-live-filtered match mask from a shared ``eval``
        pass (the fused top-k+facets path)."""
        if _mask is not None:
            mask = _mask
        else:
            mask, _ = self.eval(q, sim, stats)
            mask = self._apply_live(mask)
        vals = self.col(col)
        sample = next((v for v in vals if v is not None), None)
        if isinstance(sample, (list, np.ndarray)):
            out: dict[Any, int] = {}
            if mode == "multi":
                for v in vals[mask]:
                    if v is None:
                        continue
                    for item in v:
                        out[item] = out.get(item, 0) + 1
                return out
            max_depth = max((len(v) for v in vals[mask] if v is not None), default=0)
            for depth in range(1, max_depth + 1):
                level = self._facet_level_col(col, depth)[mask]
                level = level[level != np.array(None)]
                uniq, cnt = np.unique(level, return_counts=True)
                for v, c in zip(uniq.tolist(), cnt.tolist()):
                    out[v] = out.get(v, 0) + int(c)
            return out
        sel = vals[mask]
        if sel.dtype == object:
            # docs without a value in the facet field aren't counted (and
            # None is unsortable against str inside np.unique)
            sel = sel[sel != np.array(None)]
        uniq, cnt = np.unique(sel, return_counts=True)
        return {v: int(c) for v, c in zip(uniq.tolist(), cnt.tolist())}

    def facet_children_first(self, col: str, path: Sequence[str] = ()) -> dict[str, int]:
        """First-occurrence docid per taxonomy child one level below ``path``
        (drilldownFieldnames taxonomy-order support, Lucene.java:692-713):
        the reference's TaxonomyReader returns children in insertion order —
        the order labels were first added while indexing.  Docids here are
        globally monotone with ingestion order, so min-docid-per-child IS
        that order.  Deliberately no live-doc filter: a Lucene taxonomy
        never forgets labels of deleted docs."""
        depth = len(path) + 1
        level = self._facet_level_col(col, depth)
        keep = level != np.array(None)
        if path:
            prefix = ">".join(path) + ">"
            pref_ok = np.array(
                [isinstance(v, str) and v.startswith(prefix) for v in level], dtype=bool
            )
            keep &= pref_ok
        idx = np.flatnonzero(keep)
        if not len(idx):
            return {}
        vals = level[idx]
        if path:
            plen = len(prefix)
            vals = np.array([v[plen:] for v in vals], dtype=object)
        uniq, inv = np.unique(vals, return_inverse=True)
        first = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, inv, self.docid[idx])
        return {str(v): int(d) for v, d in zip(uniq.tolist(), first.tolist())}

    def dedup_groups(
        self,
        q,
        sim: BM25,
        stats: dict,
        key_col: str,
        sort_col: str | None,
        attach_cols: Sequence[str] = (),
        _precomputed: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> pa.Table:
        """Per-key aggregates over ALL matching docs (DeDupFilterSuperCollector
        analog, /root/reference/src/org/meresco/lucene/search/DeDupFilterSuperCollector.java:43-258):
        for every dedup key seen: count, best-scoring doc (group rank) and the
        representative = doc with max sort_col (ties → min docid).

        ``attach_cols``: stored columns gathered for each key's LOCAL
        representative, emitted as ``sv_<col>`` — field-sorted grouping ranks
        groups by the representatives' sort fields, and attaching the values
        at the source keeps the merge free of a per-group fetch (the global
        representative's values ride on whichever partial row wins).

        ``_precomputed``: an already-live-filtered (mask, raw scores) pair
        from one shared ``eval`` pass — the fused dedup+facets path
        (DeDupFilterSuperCollector composing with FacetSuperCollector in one
        search, Lucene.java:436-480) evaluates the query ONCE per segment."""
        if _precomputed is not None:
            mask, scores = _precomputed
        else:
            mask, scores = self.eval(q, sim, stats)
            mask = self._apply_live(mask)
        if stats.get("f32", True):
            scores = scores.astype(np.float32).astype(np.float64)  # float32 like Lucene
        idx = np.flatnonzero(mask)
        keys = self.col(key_col)[idx]
        sc = scores[idx]
        srt = self.col(sort_col)[idx].astype(np.float64) if sort_col else sc
        uniq, inv = np.unique(keys, return_inverse=True)
        g = len(uniq)
        cnt = np.bincount(inv, minlength=g)
        max_sc = np.full(g, -np.inf)
        np.maximum.at(max_sc, inv, sc)
        best_srt = np.full(g, -np.inf)
        np.maximum.at(best_srt, inv, srt)
        # argmax with min-docid tiebreak: order candidates by (inv, -val, docid)
        did = self.docid[idx]
        rank_doc = _argmax_per_group(inv, g, sc, did)
        repr_doc = _argmax_per_group(inv, g, srt, did)
        out: dict[str, Any] = {
            "key": pa.array(uniq.tolist()),
            "cnt": pa.array(cnt.astype(np.int64)),
            "max_score": pa.array(max_sc),
            "rank_docid": pa.array(rank_doc),
            "best_sort": pa.array(best_srt),
            "repr_docid": pa.array(repr_doc),
        }
        if attach_cols:
            local = pa.array((repr_doc - self.base).astype(np.int64))
            for c in attach_cols:
                out[f"sv_{c}"] = self.docs[c].take(local).combine_chunks()
        return pa.table(out)

    def collect_keys(self, q, sim: BM25, stats: dict, key_col: str, size: int) -> np.ndarray:
        """KeyCollector analog: bitset over key values of matching docs
        (/root/reference/src/org/meresco/lucene/search/join/KeyCollector.java:37-78)."""
        mask, _ = self.eval(q, sim, stats)
        mask = self._apply_live(mask)
        keys = self.col(key_col).astype(np.int64)[mask]
        bs = np.zeros(size, dtype=bool)
        keys = keys[(keys >= 0) & (keys < size)]
        bs[keys] = True
        return bs

    def key_max_scores(self, q, sim: BM25, stats: dict, key_col: str, size: int) -> np.ndarray:
        """ScoreSuperCollector analog: per-key max score array
        (/root/reference/src/org/meresco/lucene/search/ScoreSuperCollector.java:96-140)."""
        mask, scores = self.eval(q, sim, stats)
        mask = self._apply_live(mask)
        keys = self.col(key_col).astype(np.int64)
        ok = mask & (keys >= 0) & (keys < size)
        out = np.zeros(size, dtype=np.float64)
        np.maximum.at(out, keys[ok], scores[ok])
        return out

    def key_value_pairs(self, key_col: str, val_col: str) -> tuple[np.ndarray, np.ndarray]:
        """(key, value) pairs of all docs (join-sort source side; JoinSortCollector
        maps key→doc then chases the sort value — we extract the map directly)."""
        keys = self.col(key_col).astype(np.int64)
        vals = self.col(val_col)
        ok = keys >= 0
        return keys[ok], vals[ok]

    def prefix_terms(
        self, prefix: str, limit: int, field: str | None = None
    ) -> tuple[list[str], np.ndarray, bool]:
        """(terms, dfs, truncated) in the prefix range; ``truncated`` is True
        only when the scan STOPPED at ``limit`` with matching terms left —
        the exact per-segment signal the engine's cap warning reports."""
        import bisect

        scan_prefix = full_term(field, prefix)
        strip = len(scan_prefix) - len(prefix)  # drop the "<field>\x1f" part
        lo = bisect.bisect_left(self.terms, scan_prefix)
        terms, dfs = [], []
        truncated = False
        for i in range(lo, len(self.terms)):
            t = self.terms[i]
            if not t.startswith(scan_prefix):
                break
            if field is None and FIELD_SEP in t:
                continue  # default-field scan skips other fields' keys
            if len(terms) >= limit:
                truncated = True
                break
            terms.append(t[strip:] if strip else t)
            dfs.append(int(self.df[i]))
        return terms, np.asarray(dfs, dtype=np.int64), truncated

    def stored_prefix_counts(
        self, col: str, prefix: str, limit: int
    ) -> tuple[dict[str, int], bool]:
        """prefixSearch pushdown for a stored keyword/docvalue column (no
        postings — Lucene.java:629-666 served from the doc values instead):
        (value, live-doc count) pairs RESTRICTED to the prefix range, so only
        matching values ship to the driver.  The former path ran a MatchAll
        facet per segment and prefix-filtered driver-side, paying the full
        distinct-value payload for a one-character prefix.  Scalar string
        columns count docs per value; list<string> taxonomy columns count
        docs per '>'-joined path prefix with hierarchical rollup — identical
        keys and counts to ``facet_counts(MatchAll)`` ∩ prefix.
        ``truncated`` mirrors prefix_terms' safety-valve signal: True only
        when matching values were dropped at ``limit``."""
        import pyarrow.compute as pc

        live = self._apply_live(np.ones(self.n, dtype=bool))
        vals = self.col(col)
        sample = next((v for v in vals if v is not None), None)
        out: dict[str, int] = {}
        if isinstance(sample, (list, np.ndarray)):
            lv = vals[live]
            max_depth = max((len(v) for v in lv if v is not None), default=0)
            live_arr = pa.array(live)
            # every depth is scanned: a depth-d key USUALLY holds d-1 '>'
            # separators, but a path COMPONENT may itself contain '>' (the
            # former depth prune dropped such keys for '>'-bearing prefixes);
            # the scan is Arrow C per depth (starts_with + filter +
            # value_counts) over a per-(col,depth)-cached string array, not a
            # per-doc Python loop
            for depth in range(1, max_depth + 1):
                level = self._facet_level_arrow(col, depth)
                m = pc.and_(
                    pc.fill_null(pc.starts_with(level, prefix), False), live_arr
                )
                sel = level.filter(m)
                if not len(sel):
                    continue
                for s in sel.value_counts():
                    v = s["values"].as_py()
                    out[v] = out.get(v, 0) + s["counts"].as_py()
        elif isinstance(sample, str):
            arr = self.docs[col].combine_chunks()
            m = (
                pc.fill_null(pc.starts_with(arr, prefix), False).to_numpy(
                    zero_copy_only=False
                )
                & live
            )
            if m.any():
                uniq, cnt = np.unique(vals[m], return_counts=True)
                out = {str(v): int(c) for v, c in zip(uniq.tolist(), cnt.tolist())}
        # non-string scalar columns: no value can string-prefix-match (the
        # former driver-side filter dropped them with isinstance(v, str))
        truncated = len(out) > limit
        if truncated:
            out = dict(sorted(out.items())[:limit])
        return out, truncated

    def fetch(self, docids: np.ndarray, cols: Sequence[str]) -> pa.Table:
        local = (np.asarray(docids, dtype=np.int64) - self.base).astype(np.int64)
        sel = pa.array(local)
        data = {"docid": pa.array(np.asarray(docids, dtype=np.int64))}
        for c in cols:
            data[c] = self.docs[c].take(sel).combine_chunks()
        return pa.table(data)


def _argmax_per_group(inv: np.ndarray, g: int, val: np.ndarray, docid: np.ndarray) -> np.ndarray:
    """For each group: docid of the row with max val (ties → min docid)."""
    order = np.lexsort((docid, -val, inv))  # by group, then val desc, then docid asc
    ginv = inv[order]
    first = np.ones(ginv.size, dtype=bool)
    first[1:] = ginv[1:] != ginv[:-1]
    out = np.empty(g, dtype=np.int64)
    out[ginv[first]] = docid[order][first]
    return out


def _range_mask(vals: np.ndarray, q: RangeQ) -> np.ndarray:
    mask = np.ones(vals.shape, dtype=bool)
    if q.lo is not None:
        mask &= (vals >= q.lo) if q.include_lo else (vals > q.lo)
    if q.hi is not None:
        mask &= (vals <= q.hi) if q.include_hi else (vals < q.hi)
    return mask


def _sortable(v: np.ndarray, missing) -> np.ndarray:
    """Convert to a numpy-sortable array, applying missing-value sentinels
    (STRING_FIRST/LAST, JAVA_MAX_INT analogs — fieldregistry.py:168-236)."""
    if v.dtype == object:
        filled = np.asarray([("" if missing is None else str(missing)) if x is None else str(x) for x in v], dtype=object)
        # np.lexsort can't take object; factorize to codes
        uniq, codes = np.unique(filled, return_inverse=True)
        return codes.astype(np.int64)
    if np.issubdtype(v.dtype, np.floating):
        fill = np.nan if missing is None else float(missing)
        return np.nan_to_num(v, nan=(np.inf if missing is MISSING_LAST else (fill if missing is not None else np.inf)))
    return v


def _neg_for_desc(v: np.ndarray, desc: bool) -> np.ndarray:
    return -v if desc else v
