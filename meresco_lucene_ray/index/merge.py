"""Segment merging via a stateful actor pool.

Reference parity: Lucene's TieredMergePolicy background merges
(segmentsPerTier=8, maxMergeAtOnce=2 —
/root/reference/src/org/meresco/lucene/LuceneSettings.java:55,157-160).
Here a merge is an explicit stage: a pool of ``SegmentMerger`` actors, each
merging one GROUP of source segments into one target segment, docids
remapped per Lucene's model (per-segment docid spaces; merge remaps by
segment ordinal — SURVEY.md §7.4 "Global docid order vs incremental
builds").

Decode → remap → re-encode is fully vectorized: a source segment's entire
postings column is varint-decoded in one pass (df/tf counts give the group
boundaries), merged across segments with one lexsort, and re-encoded with
the same grouped encoders the builder uses.
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import SHARD_BITS, IndexConfig, _atomic_write_segment, _segment_complete
from .codec import (
    encode_segment_positions,
    encode_segment_postings,
    grouped_delta,
    varint_decode,
)
from .manifest import IndexManifest, SegmentInfo


def _grouped_cumsum(gaps: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Inverse of grouped_delta: absolute values with reset at group starts."""
    cs = np.cumsum(gaps, dtype=np.uint64)
    base = cs[starts] - gaps[starts]
    return cs - np.repeat(base, lengths)


def _decode_whole_segment(seg_dir: str):
    """Decode one segment's full postings into flat arrays.

    Returns dict with: terms (object[] per term), df, per-posting
    (term_ord, docid_local, tf), and flat positions (+ posting starts) or None.
    """
    from .codec import BLOCK_SIZE, _segments_arange

    post = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
    df = post["df"].to_numpy()
    n_post = int(df.sum())
    term_starts = (
        np.concatenate(([0], np.cumsum(df)[:-1])).astype(np.int64)
        if df.size
        else np.zeros(0, np.int64)
    )
    docs_concat = b"".join(post["docs"].to_pylist())
    tfs_concat = b"".join(post["tfs"].to_pylist())
    gaps = varint_decode(docs_concat)
    # gaps reset at every block start within each term
    bounds = np.concatenate((term_starts, [n_post])).astype(np.int64)
    nblocks = (np.diff(bounds) + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_bounds = np.concatenate(([0], np.cumsum(nblocks))).astype(np.int64)
    term_of_blk, blk_within = _segments_arange(blk_bounds)
    starts_g = (bounds[:-1][term_of_blk] + blk_within * BLOCK_SIZE).astype(np.int64)
    blk_lengths = np.minimum(starts_g + BLOCK_SIZE, bounds[1:][term_of_blk]) - starts_g
    docids = _grouped_cumsum(gaps, starts_g, blk_lengths)
    tfs = varint_decode(tfs_concat)
    term_ord = np.repeat(np.arange(len(df), dtype=np.int64), df.astype(np.int64))
    out = {
        "terms": np.asarray(post["term"].to_pylist(), dtype=object),
        "df": df,
        "term_ord": term_ord,
        "docids": docids,
        "tfs": tfs,
    }
    if "pos" in post.column_names:
        pos_concat = b"".join(post["pos"].to_pylist())
        pgaps = varint_decode(pos_concat)
        plen = tfs.astype(np.int64)
        # zero postings: the usual concat(([0], cumsum[:-1])) yields [0]
        # against an empty plen and _grouped_cumsum indexes an empty cs
        pstarts = (
            np.concatenate(([0], np.cumsum(plen)[:-1])).astype(np.int64)
            if plen.size
            else np.zeros(0, np.int64)
        )
        out["positions_flat"] = _grouped_cumsum(pgaps, pstarts, plen)
        out["posting_starts"] = pstarts
    docs_table = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
    out["docs_table"] = docs_table
    return out


def _tombstone_digest(index_dir: str) -> str:
    """sha256 of the tombstones file contents ('none' when absent) — part of
    the merge resume fingerprint so stale pre-delete segments are rebuilt."""
    import hashlib

    path = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(path):
        return "none"
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


class SegmentMerger:
    """One actor merges one group of segments into one new segment."""

    def __init__(self, index_dir: str, out_dir: str, cfg_dict: dict):
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.cfg = IndexConfig(**cfg_dict)

    def merge(self, seg_paths: list[str], new_shard: int) -> dict:
        cfg = self.cfg
        seg_rel = f"segments/seg={new_shard:05d}"
        seg_dir = os.path.join(self.out_dir, seg_rel)
        # the fingerprint covers config + sources + CURRENT tombstone state:
        # merging expunges tombstoned docs, so a segment merged before newer
        # delete_documents calls must NOT be reused on resume
        fp = cfg.fingerprint() + ":" + ",".join(seg_paths) + ":" + _tombstone_digest(self.index_dir)
        import hashlib

        fp = hashlib.sha256(fp.encode()).hexdigest()[:16]
        if not _segment_complete(seg_dir, fp):
            self._do_merge(seg_paths, new_shard, seg_dir, fp)
        dmeta = pq.read_metadata(os.path.join(seg_dir, "docs.parquet"))
        pmeta = pq.read_metadata(os.path.join(seg_dir, "postings.parquet"))
        dls = pq.read_table(os.path.join(seg_dir, "docs.parquet"), columns=["dl"])
        return {
            "shard": new_shard,
            "num_docs": dmeta.num_rows,
            "sum_dl": int(pa.compute.sum(dls["dl"]).as_py() or 0),
            "num_terms": pmeta.num_rows,
            "path": seg_rel,
            "fingerprint": fp,
        }

    def _do_merge(self, seg_paths: list[str], new_shard: int, seg_dir: str, fp: str):
        from .tombstones import TombstoneSet, tombstone_path

        decoded = [_decode_whole_segment(os.path.join(self.index_dir, p)) for p in seg_paths]
        # merging EXPUNGES tombstoned docs (Lucene: merges drop deletes);
        # keep masks + compact local-docid remaps per source segment.
        # This runs inside the merge TASK — the set is loaded off-driver and
        # the per-doc probe is the vectorized exact lookup (no bloom needed:
        # every id is probed exactly once here).
        tp = tombstone_path(self.index_dir)
        tombstones = TombstoneSet(tp) if tp else None
        for d in decoded:
            ids_arr = d["docs_table"]["__id__"]
            shard = (
                int(d["docs_table"]["docid"][0].as_py()) >> SHARD_BITS if len(ids_arr) else 0
            )
            if tombstones is None:
                keep = np.ones(len(ids_arr), dtype=bool)
            else:
                keep = tombstones.before_shard_of(ids_arr) <= shard
            d["keep_doc"] = keep
            d["remap"] = np.cumsum(keep) - 1  # old local -> new local (valid where keep)
            # filter postings rows by their doc's liveness
            local = (d["docids"] & np.uint64((1 << SHARD_BITS) - 1)).astype(np.int64)
            pk = keep[local]
            d["term_ord"] = d["term_ord"][pk]
            d["docids"] = d["docids"][pk]
            d["tfs_kept_mask"] = pk
            if "posting_starts" in d:
                d["posting_starts"] = d["posting_starts"][pk]
            d["tfs"] = d["tfs"][pk]
            d["local_kept"] = local[pk]
            d["docs_table"] = d["docs_table"].filter(pa.array(keep))
        doc_offsets = np.cumsum([0] + [len(d["docs_table"]) for d in decoded[:-1]])
        new_base = np.uint64(new_shard) << np.uint64(SHARD_BITS)

        # global term dictionary across the group
        import pandas as pd

        all_terms = np.concatenate([d["terms"] for d in decoded])
        codes, uniques = pd.factorize(all_terms, sort=False)
        uniq = np.asarray(uniques, dtype=object)
        order = np.argsort(uniq)
        rank = np.empty(order.size, dtype=np.int64)
        rank[order] = np.arange(order.size)
        uniq_sorted = uniq[order]
        # per-segment term-ord -> global sorted term id
        seg_term_maps = []
        off = 0
        for d in decoded:
            seg_term_maps.append(rank[codes[off : off + len(d["terms"])]])
            off += len(d["terms"])

        gids, docids, tfs = [], [], []
        have_pos = all("positions_flat" in d for d in decoded) and self.cfg.store_positions
        pos_parts, pos_len = [], []
        for si, d in enumerate(decoded):
            gids.append(seg_term_maps[si][d["term_ord"]])
            new_local = d["remap"][d["local_kept"]].astype(np.uint64)
            docids.append(new_base | (new_local + np.uint64(doc_offsets[si])))
            tfs.append(d["tfs"])
        gids = np.concatenate(gids)
        docids = np.concatenate(docids)
        tfs = np.concatenate(tfs)
        # stable sort on term id alone: per-segment postings are docid-
        # ascending, segments are concatenated in ascending remapped-docid
        # ranges, so stability yields docid-ascending postings per term
        sort = np.argsort(gids, kind="stable")
        g_sorted, d_sorted, tf_sorted = gids[sort], docids[sort], tfs[sort]
        term_starts = (
            np.concatenate(([0], np.flatnonzero(g_sorted[1:] != g_sorted[:-1]) + 1)).astype(np.int64)
            if g_sorted.size
            else np.zeros(0, dtype=np.int64)
        )
        bounds = np.concatenate((term_starts, [g_sorted.size])).astype(np.int64)
        dl_all = np.concatenate(
            [d["docs_table"]["dl"].to_numpy(zero_copy_only=False) for d in decoded]
        ).astype(np.float64) if decoded else np.zeros(0)
        local_mask = np.uint64((1 << SHARD_BITS) - 1)
        post_dls = dl_all[(d_sorted & local_mask).astype(np.int64)] if d_sorted.size else None
        docs_col, tfs_col, blk_last, blk_maxtf, blk_doc_off, blk_tf_off, blk_maxtfdl = (
            encode_segment_postings(term_starts, d_sorted, tf_sorted, dls=post_dls)
        )
        post_cols = {
            "term": pa.array(uniq_sorted[g_sorted[term_starts]].tolist() if term_starts.size else [], type=pa.string()),
            "df": pa.array(np.diff(bounds).astype(np.int64)),
            "cf": pa.array(
                np.add.reduceat(tf_sorted, bounds[:-1]).astype(np.int64)
                if g_sorted.size
                else np.zeros(0, np.int64)
            ),
            "docs": docs_col,
            "tfs": tfs_col,
            "blk_last": blk_last,
            "blk_maxtf": blk_maxtf,
            "blk_doc_off": blk_doc_off,
            "blk_tf_off": blk_tf_off,
        }
        if blk_maxtfdl is not None:
            post_cols["blk_maxtfdl"] = blk_maxtfdl
        if have_pos:
            # gather each posting's position span into merged (term, doc) order
            flat_parts = [d["positions_flat"] for d in decoded]
            start_parts = []
            shift = 0
            for d in decoded:
                start_parts.append(d["posting_starts"] + shift)
                shift += d["positions_flat"].size
            positions_flat = np.concatenate(flat_parts) if flat_parts else np.zeros(0, np.uint64)
            posting_starts_old = np.concatenate(start_parts).astype(np.int64)
            L = tfs.astype(np.int64)[sort]
            # zero postings (all docs empty / everything tombstoned): cumsum
            # would yield out_starts=[0] against an empty L and break the
            # np.repeat broadcast — the merge-time twin of the empty-shard
            # positions guard in build.py
            out_starts = (
                np.concatenate(([0], np.cumsum(L)[:-1])).astype(np.int64)
                if L.size
                else np.zeros(0, np.int64)
            )
            total = int(L.sum())
            gather = np.repeat(posting_starts_old[sort], L) + (
                np.arange(total, dtype=np.int64) - np.repeat(out_starts, L)
            )
            pos_col, pos_offs = encode_segment_positions(
                bounds, positions_flat[gather], out_starts
            )
            post_cols["pos"] = pos_col
            post_cols["pos_offs"] = pos_offs
        postings = pa.table(post_cols)

        # docs table: concat with remapped docids (rows already tombstone-filtered)
        doc_tables = []
        for si, d in enumerate(decoded):
            t = d["docs_table"]
            new_ids = (
                new_base | (np.arange(len(t), dtype=np.uint64) + np.uint64(doc_offsets[si]))
            ).astype(np.int64)
            t = t.set_column(t.schema.get_field_index("docid"), "docid", pa.array(new_ids))
            doc_tables.append(t)
        docs_table = pa.concat_tables(doc_tables, promote_options="default")
        _atomic_write_segment(seg_dir, fp, postings, docs_table)


def merge_index(
    index_dir: str,
    out_dir: str,
    max_merge_at_once: int = 8,
    num_actors: int = 4,
    num_cpus: float = 1.0,
) -> IndexManifest:
    """Merge an index's segments in groups of ``max_merge_at_once`` through a
    pool of SegmentMerger actors; publishes a new manifest in ``out_dir``.
    ``num_cpus`` is the per-merger reservation (fractional fits a small
    test session alongside live searcher actors)."""
    import ray

    src = IndexManifest.load(index_dir)
    os.makedirs(out_dir, exist_ok=True)
    groups: list[list[str]] = []
    cur: list[str] = []
    for seg in src.segments:
        cur.append(seg.path)
        if len(cur) >= max_merge_at_once:
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)

    Actor = ray.remote(num_cpus=num_cpus)(SegmentMerger)
    pool = [
        Actor.remote(index_dir, out_dir, src.config) for _ in range(min(num_actors, len(groups)))
    ]
    futures = [pool[i % len(pool)].merge.remote(g, i) for i, g in enumerate(groups)]
    infos = ray.get(futures)
    # release the reservations immediately — the async GC-kill can lag past
    # the next actor creation in a CPU-tight session
    for a in pool:
        ray.kill(a, no_restart=True)

    segments = [SegmentInfo(**info) for info in sorted(infos, key=lambda x: x["shard"])]
    manifest = IndexManifest(
        version=src.version + 1,
        num_docs=sum(s.num_docs for s in segments),
        sum_dl=sum(s.sum_dl for s in segments),
        num_shards=len(segments),
        config=src.config,
        segments=segments,
        metrics={**src.metrics, "merged_from": len(src.segments)},
    )
    # recompute global term stats from the merged segments (tombstoned docs
    # were expunged, so df/cf may have shrunk)
    parts = [
        pq.read_table(os.path.join(out_dir, s.path, "postings.parquet"), columns=["term", "df", "cf"])
        for s in segments
    ]
    stats = (
        pa.concat_tables(parts)
        .group_by("term")
        .aggregate([("df", "sum"), ("cf", "sum")])
        .rename_columns(["term", "df", "cf"])
        .sort_by("term")
        if parts
        else pa.table({"term": [], "df": [], "cf": []})
    )
    pq.write_table(stats, os.path.join(out_dir, "termstats.parquet"))
    manifest.metrics["num_terms_global"] = len(stats)
    manifest.save(out_dir)
    return manifest
