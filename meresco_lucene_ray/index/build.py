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

from ..analysis import tokenize_batch, token_positions
from .codec import encode_postings, encode_position_lists
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
        dl = np.fromiter((len(t) for t in toks), dtype=np.int32, count=len(toks))

        uniq_terms: list[list[str]] = []
        tfs: list[list[int]] = []
        poss: list[list[list[int]]] = []
        for tlist in toks:
            pos = token_positions(tlist)
            terms = sorted(pos)
            uniq_terms.append(terms)
            tfs.append([len(pos[t]) for t in terms])
            if cfg.store_positions:
                poss.append([pos[t] for t in terms])

        cols: dict[str, Any] = {
            "__id__": pa.array(ids, type=pa.string()),
            "shard": pa.array(_shard_of(ids, cfg.num_shards)),
            "dl": pa.array(dl),
            "terms": pa.array(uniq_terms, type=pa.list_(pa.string())),
            "tfs": pa.array(tfs, type=pa.list_(pa.int32())),
        }
        if cfg.store_positions:
            cols["positions"] = pa.array(poss, type=pa.list_(pa.list_(pa.int32())))
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
        flat_terms = np.asarray(terms_col.flatten().to_pylist(), dtype=object)
        flat_tfs = tfs_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        lengths = np.asarray(
            [len(terms_col[i]) if terms_col[i].is_valid else 0 for i in range(len(terms_col))],
            dtype=np.int64,
        )
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)

        uniq, term_ids = np.unique(flat_terms, return_inverse=True)
        # per-doc term lists are sorted, docs are in docid order → lexsort by (term, doc)
        sort = np.lexsort((doc_idx, term_ids))
        t_sorted = term_ids[sort]
        d_sorted = doc_idx[sort]
        tf_sorted = flat_tfs[sort]
        bounds = np.concatenate(([0], np.flatnonzero(t_sorted[1:] != t_sorted[:-1]) + 1, [t_sorted.size]))

        pos_lists = None
        if cfg.store_positions:
            pcol = group["positions"].combine_chunks()
            pos_lists = pcol.to_pylist()  # per doc: list of per-term position lists

        rows_term, rows_df, rows_cf = [], [], []
        docs_bufs, tfs_bufs, blk_last, blk_maxtf = [], [], [], []
        pos_bufs, pos_offs = [], []
        # term-local index of each flat entry (position list lookup)
        term_ordinal_in_doc = _term_ordinals(lengths)
        ord_sorted = term_ordinal_in_doc[sort]
        for ti in range(len(uniq)):
            lo, hi = bounds[ti], bounds[ti + 1]
            dlocal = d_sorted[lo:hi]
            docs = docids_global[dlocal]
            tfs = tf_sorted[lo:hi]
            db, tb, bl, bm = encode_postings(docs, tfs)
            rows_term.append(uniq[ti])
            rows_df.append(hi - lo)
            rows_cf.append(int(tfs.sum()))
            docs_bufs.append(db)
            tfs_bufs.append(tb)
            blk_last.append(bl)
            blk_maxtf.append(bm)
            if cfg.store_positions:
                plists = [pos_lists[dlocal[j]][ord_sorted[lo + j]] for j in range(hi - lo)]
                pb, po = encode_position_lists(plists)
                pos_bufs.append(pb)
                pos_offs.append(po)

        post_cols = {
            "term": pa.array(list(rows_term), type=pa.string()),
            "df": pa.array(rows_df, type=pa.int64()),
            "cf": pa.array(rows_cf, type=pa.int64()),
            "docs": pa.array(docs_bufs, type=pa.large_binary()),
            "tfs": pa.array(tfs_bufs, type=pa.large_binary()),
            "blk_last": pa.array([b.tolist() for b in blk_last], type=pa.list_(pa.int64())),
            "blk_maxtf": pa.array([b.tolist() for b in blk_maxtf], type=pa.list_(pa.int32())),
        }
        if cfg.store_positions:
            post_cols["pos"] = pa.array(pos_bufs, type=pa.large_binary())
            post_cols["pos_offs"] = pa.array([o.tolist() for o in pos_offs], type=pa.list_(pa.int64()))
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


def _term_ordinals(lengths: np.ndarray) -> np.ndarray:
    """For flattened per-doc lists: ordinal of each entry within its doc."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


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

    term_rows = tokenized.groupby("shard").map_groups(build_segment, batch_format="pyarrow")
    # global term stats: groupby(term)-aggregate shuffle over per-segment rows
    stats = term_rows.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
    )
    stats_table = stats.sort("term").to_arrow_refs()
    import ray as _ray

    stats_tables = [t for t in _ray.get(stats_table)]
    merged = pa.concat_tables(stats_tables) if stats_tables else pa.table({"term": [], "df": [], "cf": []})
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
