"""Inverted-index build as a Ray Data pipeline.

Pipeline shape (Ray-Data-first, not a port of the reference's per-doc HTTP
ingest — /root/reference/src/org/meresco/lucene/http/UpdateHandler.java:44-56):

    read corpus Dataset
      → map_batches(TokenizeStage, batch_format="pyarrow")     # stateless, vectorized;
            adds __id__, shard, dl, sha256, per-doc (terms, tfs, positions);
            DROPS the raw content column right here (wide rows never shuffle)
      → groupby("shard").map_groups(SegmentBuilder)            # the ONE wide shuffle,
            hash-partitioned on __id__ → doc-sharded segments (like Lucene
            segments / ES shards); inside: upsert dedup (last-write-wins per
            __id__, mirroring updateDocument(Term(__id__,id)) at
            /root/reference/src/org/meresco/lucene/Lucene.java:166-171),
            deterministic local docids, numpy posting construction,
            delta+varint encode with block-max metadata, atomic segment write
      → Dataset of per-segment (term, df, cf) rows
      → groupby("term").aggregate(Sum)                          # global term stats
            (small: one row per distinct term per segment, already combined)

Scale notes (100 TB design point):
- Document sharding (hash(__id__) % S) sidesteps the hot-term skew problem of
  a term-partitioned groupby: a mega-term ("the", "def") costs one long numpy
  array per segment, never one giant shuffle group.  S is chosen so a segment
  ≈ 0.5–2 GB; at 10^12 files that is S ≈ 10^5-10^6 — the shuffle key stays
  well balanced because it is a hash of a unique id.
- Content is dropped before the shuffle; only token arrays move.
- Segments are written atomically (tmp dir + rename) with a _SUCCESS marker
  and a config/lineage fingerprint; a re-run with the same fingerprint skips
  the segment (resume) and merely re-reads its term stats.
- Docids are deterministic: (shard << 40) | rank-of-__id__-within-shard, so
  retries and resumes produce byte-identical segments.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import zlib
from dataclasses import dataclass, field, asdict
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis import tokenize_batch
from .codec import encode_segment_positions, encode_segment_postings
from .manifest import IndexManifest, SegmentInfo

SHARD_BITS = 40  # docid = (shard << SHARD_BITS) | local_rank


@dataclass
class IndexConfig:
    text_col: str = "content"
    id_col: str | None = None          # existing unique-id column; or None → use id_expr cols
    id_from: tuple[str, ...] = ()       # build __id__ = ":".join(cols) when id_col is None
    stored_cols: tuple[str, ...] = ()   # docvalue/stored columns carried into docs.parquet
    num_shards: int = 8
    store_positions: bool = True        # needed for phrase queries
    hash_content: bool = True           # per-row sha256(content) ingest invariant
    k1: float = 0.9
    b: float = 0.4

    def fingerprint(self) -> str:
        return hashlib.sha256(repr(sorted(asdict(self).items())).encode()).hexdigest()[:16]


def _shard_of(ids: list[str], num_shards: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(i.encode()) % num_shards for i in ids), dtype=np.int32, count=len(ids)
    )


class TokenizeStage:
    """Stateless ``map_batches`` stage: normalize + tokenize + drop content.

    Emits one row per input doc:
      __id__, shard, dl, [content_sha256], terms (list<str> unique terms),
      tfs (list<int32>), [positions flattened varint-ready], stored cols.
    """

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch[cfg.text_col].to_pylist()
        if cfg.id_col:
            ids = [str(x) for x in batch[cfg.id_col].to_pylist()]
        else:
            parts = [batch[c].to_pylist() for c in cfg.id_from]
            ids = [":".join(str(v) for v in row) for row in zip(*parts)]
        toks = tokenize_batch(texts)
        ndocs = len(toks)
        dl = np.fromiter((len(t) for t in toks), dtype=np.int32, count=ndocs)

        # batch-global vectorized (doc, term, positions) aggregation:
        # flatten all tokens, one np.unique, one lexsort — no per-doc loops
        from itertools import chain

        flat = np.array(list(chain.from_iterable(toks)), dtype=object)
        lengths = dl.astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lengths)
        pos_in_doc = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lengths)
        if flat.size:
            import pandas as pd

            inv, uniques = pd.factorize(flat, sort=False)
            uniq = np.asarray(uniques, dtype=object)
            order = np.lexsort((pos_in_doc, inv, doc_idx))
            di, ti, pi = doc_idx[order], inv[order], pos_in_doc[order]
            run_start = np.ones(di.size, dtype=bool)
            run_start[1:] = (di[1:] != di[:-1]) | (ti[1:] != ti[:-1])
            run_ids = np.flatnonzero(run_start)
            run_bounds = np.concatenate((run_ids, [di.size]))
            run_tf = np.diff(run_bounds).astype(np.int32)
            runs_per_doc = np.bincount(di[run_ids], minlength=ndocs)
        else:
            uniq = np.empty(0, dtype=object)
            run_ids = np.empty(0, dtype=np.int64)
            run_bounds = np.zeros(1, dtype=np.int64)
            run_tf = np.empty(0, dtype=np.int32)
            runs_per_doc = np.zeros(ndocs, dtype=np.int64)
            ti = np.empty(0, dtype=np.int64)
            pi = np.empty(0, dtype=np.int64)

        outer_off = np.concatenate(([0], np.cumsum(runs_per_doc))).astype(np.int32)
        term_values = pa.array(uniq[ti[run_ids]].tolist() if run_ids.size else [], type=pa.string())
        terms_col = pa.ListArray.from_arrays(pa.array(outer_off), term_values)
        tfs_col = pa.ListArray.from_arrays(pa.array(outer_off), pa.array(run_tf))

        cols: dict[str, Any] = {
            "__id__": pa.array(ids, type=pa.string()),
            "shard": pa.array(_shard_of(ids, cfg.num_shards)),
            "dl": pa.array(dl),
            "terms": terms_col,
            "tfs": tfs_col,
        }
        if cfg.store_positions:
            inner = pa.ListArray.from_arrays(
                pa.array(run_bounds.astype(np.int32)), pa.array(pi.astype(np.int32))
            )
            cols["positions"] = pa.ListArray.from_arrays(pa.array(outer_off), inner)
        if cfg.hash_content:
            cols["content_sha256"] = pa.array(
                [hashlib.sha256((t or "").encode()).hexdigest() for t in texts],
                type=pa.string(),
            )
        for c in cfg.stored_cols:
            cols[c] = batch[c]
        return pa.table(cols)


class SegmentBuilder:
    """``map_groups`` stage: one group = one doc shard → one segment on disk.

    Returns one row per term: (shard, term, df, cf) for the global
    ``groupby(term)`` stats aggregate.
    """

    def __init__(self, index_dir: str, cfg: IndexConfig):
        self.index_dir = index_dir
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        shard = int(group["shard"][0].as_py())
        seg_rel = f"segments/seg={shard:05d}"
        seg_dir = os.path.join(self.index_dir, seg_rel)
        fp = cfg.fingerprint()

        if _segment_complete(seg_dir, fp):
            t = pq.read_table(os.path.join(seg_dir, "postings.parquet"), columns=["term", "df", "cf"])
            return t.append_column("shard", pa.array(np.full(len(t), shard, dtype=np.int32)))

        # ---- upsert dedup: last-write-wins per __id__ (dedup by sorted order,
        # keep the lexicographically-last row id occurrence deterministically)
        ids = np.asarray(group["__id__"].to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        # keep LAST occurrence per id in input order among equal ids:
        # stable argsort keeps input order within equal keys → take the last of each run
        sorted_ids = ids[order]
        is_last = np.ones(len(sorted_ids), dtype=bool)
        if len(sorted_ids) > 1:
            is_last[:-1] = sorted_ids[:-1] != sorted_ids[1:]
        keep = order[is_last]  # sorted unique ids, local docid = 0..n-1 in id order
        n = keep.size
        docids_global = (np.uint64(shard) << np.uint64(SHARD_BITS)) | np.arange(n, dtype=np.uint64)

        group = group.take(pa.array(keep))
        dl = group["dl"].to_numpy(zero_copy_only=False).astype(np.int32)

        # ---- flatten per-doc term lists, vectorized posting construction
        terms_col = group["terms"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        t_offsets = terms_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(t_offsets)
        flat_terms = terms_col.values.to_numpy(zero_copy_only=False)
        flat_tfs = tfs_col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)

        # hash-factorize term strings (O(n), no string sort), then rank-remap
        # codes so the term dictionary comes out lexicographically sorted
        # (the searcher's prefix scan bisects the sorted term column)
        import pandas as pd

        codes, uniques = pd.factorize(flat_terms, sort=False)
        uniq_arr = np.asarray(uniques, dtype=object)
        rank_order = np.argsort(uniq_arr)
        rank = np.empty(rank_order.size, dtype=np.int64)
        rank[rank_order] = np.arange(rank_order.size)
        term_ids = rank[codes]
        uniq = uniq_arr[rank_order]

        sort = np.lexsort((doc_idx, term_ids))
        t_sorted = term_ids[sort]
        d_sorted = doc_idx[sort]
        tf_sorted = flat_tfs[sort]
        if t_sorted.size:
            term_starts = np.concatenate(
                ([0], np.flatnonzero(t_sorted[1:] != t_sorted[:-1]) + 1)
            ).astype(np.int64)
        else:
            term_starts = np.zeros(0, dtype=np.int64)
        bounds = np.concatenate((term_starts, [t_sorted.size])).astype(np.int64)

        rows_term = uniq.tolist()
        rows_df = np.diff(bounds).astype(np.int64)
        rows_cf = np.add.reduceat(tf_sorted, bounds[:-1]).astype(np.int64) if t_sorted.size else np.zeros(0, dtype=np.int64)

        # one vectorized encode pass for the whole segment's postings
        docs_col, tfs_col_enc, blk_last, blk_maxtf = encode_segment_postings(
            term_starts, docids_global[d_sorted], tf_sorted
        )

        pos_col, pos_offs = None, None
        if cfg.store_positions:
            pcol = group["positions"].combine_chunks()
            inner = pcol.values  # list<int32> per (doc, term) posting, doc-major order
            inner_off = inner.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            inner_vals = inner.values.to_numpy(zero_copy_only=False).astype(np.uint64)
            inner_len = np.diff(inner_off)
            # gather position spans into (term, doc) posting order
            L = inner_len[sort]
            out_starts = np.concatenate(([0], np.cumsum(L)[:-1])).astype(np.int64)
            total = int(L.sum())
            gather = np.repeat(inner_off[:-1][sort], L) + (
                np.arange(total, dtype=np.int64) - np.repeat(out_starts, L)
            )
            positions_flat = inner_vals[gather]
            pos_col, pos_offs = encode_segment_positions(bounds, positions_flat, out_starts)

        post_cols = {
            "term": pa.array(rows_term, type=pa.string()),
            "df": pa.array(rows_df, type=pa.int64()),
            "cf": pa.array(rows_cf, type=pa.int64()),
            "docs": docs_col,
            "tfs": tfs_col_enc,
            "blk_last": blk_last,
            "blk_maxtf": blk_maxtf,
        }
        if cfg.store_positions:
            post_cols["pos"] = pos_col
            post_cols["pos_offs"] = pos_offs
        postings = pa.table(post_cols)

        doc_cols = {
            "docid": pa.array(docids_global.astype(np.int64)),
            "__id__": group["__id__"],
            "dl": pa.array(dl),
        }
        if cfg.hash_content and "content_sha256" in group.column_names:
            doc_cols["content_sha256"] = group["content_sha256"]
        for c in cfg.stored_cols:
            doc_cols[c] = group[c]
        docs_table = pa.table(doc_cols)

        _atomic_write_segment(seg_dir, fp, postings, docs_table)

        return pa.table(
            {
                "term": post_cols["term"],
                "df": post_cols["df"],
                "cf": post_cols["cf"],
                "shard": pa.array(np.full(len(rows_term), shard, dtype=np.int32)),
            }
        )


def _segment_complete(seg_dir: str, fingerprint: str) -> bool:
    marker = os.path.join(seg_dir, "_SUCCESS")
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        return f.read().strip() == fingerprint


def _atomic_write_segment(seg_dir: str, fingerprint: str, postings: pa.Table, docs: pa.Table) -> None:
    tmp = seg_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
    pq.write_table(docs, os.path.join(tmp, "docs.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(fingerprint)
    shutil.rmtree(seg_dir, ignore_errors=True)
    os.replace(tmp, seg_dir)


def build_index(ds, index_dir: str, cfg: IndexConfig | None = None) -> IndexManifest:
    """Build a sharded inverted index from a corpus Dataset; returns the manifest.

    ``ds``: ray.data.Dataset with at least cfg.text_col and the id columns.
    """
    import ray.data  # noqa: F401  (ds is already a Dataset; import keeps deps explicit)
    from ray.data.aggregate import Sum

    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)

    tokenized = ds.map_batches(
        TokenizeStage(cfg), batch_format="pyarrow", batch_size=1024
    )
    builder = SegmentBuilder(index_dir, cfg)

    def build_segment(group: pa.Table) -> pa.Table:
        return builder(group)

    term_rows = tokenized.groupby("shard").map_groups(
        build_segment, batch_format="pyarrow"
    ).materialize()
    # global term stats = groupby(term)-aggregate over per-segment rows.
    # The rows are ALREADY per-segment combined (one row per distinct term per
    # segment), so their count is tiny relative to the corpus; below a
    # threshold a driver-side arrow groupby beats a Ray all-to-all by ~15s of
    # fixed shuffle overhead.  Past it (huge vocabularies), shuffle properly.
    n_term_rows = term_rows.count()
    if n_term_rows <= 5_000_000:
        import ray as _ray

        parts = pa.concat_tables(_ray.get(term_rows.to_arrow_refs()))
        merged = (
            parts.group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
            .sort_by("term")
        )
    else:
        stats = term_rows.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
        )
        import ray as _ray

        merged = pa.concat_tables(_ray.get(stats.sort("term").to_arrow_refs()))
    pq.write_table(merged, os.path.join(index_dir, "termstats.parquet"))

    # assemble manifest from segment dirs
    segments = []
    num_docs = 0
    sum_dl = 0
    seg_root = os.path.join(index_dir, "segments")
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        seg_dir = os.path.join(seg_root, name)
        if not _segment_complete(seg_dir, cfg.fingerprint()):
            continue
        dmeta = pq.read_metadata(os.path.join(seg_dir, "docs.parquet"))
        pmeta = pq.read_metadata(os.path.join(seg_dir, "postings.parquet"))
        dls = pq.read_table(os.path.join(seg_dir, "docs.parquet"), columns=["dl"])
        sdl = int(pa.compute.sum(dls["dl"]).as_py() or 0)
        shard = int(name.split("=")[1])
        segments.append(
            SegmentInfo(
                shard=shard,
                num_docs=dmeta.num_rows,
                sum_dl=sdl,
                num_terms=pmeta.num_rows,
                path=f"segments/{name}",
                fingerprint=cfg.fingerprint(),
            )
        )
        num_docs += dmeta.num_rows
        sum_dl += sdl

    manifest = IndexManifest(
        version=1,
        num_docs=num_docs,
        sum_dl=sum_dl,
        num_shards=cfg.num_shards,
        config=asdict(cfg),
        segments=segments,
        metrics={"num_terms_global": len(merged)},
    )
    manifest.save(index_dir)
    return manifest
