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
import re
import shutil
import zlib
from dataclasses import dataclass, field, asdict
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis import (
    UNSAFE_LOWER_RE,
    lowered_token_codes,
    make_tokenizer,
    tokenize_batch,
)
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
    analyzer: str = "standard"          # "standard" | "whitespace" (M1/M3)
    ascii_folding: bool = False         # ASCIIFoldingFilter analog
    stem: str | None = None             # e.g. "dutch" (M2: emit stemmed+original)
    # ADDITIONAL tokenized text columns with their own postings, scoped BM25
    # stats and positions — the per-field-postings model of the reference
    # (DocumentStringToDocument.java:84-158; every reference fixture indexes
    # field1..field5).  Terms are keyed "<field>\x1f<term>" in the one
    # sorted dictionary; text_col stays the unprefixed DEFAULT field, so
    # single-field indexes are unchanged.  Per-field doc lengths land in
    # ``__dl__<field>`` doc columns; per-field sum_dl in the manifest
    # metrics drives each field's own avgdl.
    text_fields: tuple[str, ...] = ()
    # fields the stemmer applies to (MerescoDutchStemmingAnalyzer(String[])
    # semantics, MerescoDutchStemmingAnalyzer.java:49-66): empty → ``stem``
    # applies to ALL text fields (the no-arg-constructor behavior);
    # non-empty → only the named fields stem, others use the base analyzer
    stem_fields: tuple[str, ...] = ()
    # store per-doc (term, tf) vectors in docs.parquet — the analog of
    # Lucene's FieldType.setStoreTermVectors(true), which the reference's
    # clustering reads (MerescoClusterer.termVector); costs ~dl extra
    # storage per doc, zero extra compute (the tokenize stage already has
    # the vectors in hand)
    store_termvectors: bool = False

    def fingerprint(self) -> str:
        # canonical JSON so a config round-tripped through manifest.json
        # (tuples → lists) fingerprints identically.  Only SEMANTIC fields
        # participate: id derivation (id_col/id_from) and num_shards don't
        # change the validity of an already-built segment — an incremental
        # add may derive ids differently without invalidating old segments.
        import json

        d = asdict(self)
        for k in ("id_col", "id_from", "num_shards"):
            d.pop(k, None)
        return hashlib.sha256(
            json.dumps(d, sort_keys=True, default=list).encode()
        ).hexdigest()[:16]


def _shard_of(ids: list[str], num_shards: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(i.encode()) % num_shards for i in ids), dtype=np.int32, count=len(ids)
    )


def _sha256_column(col) -> pa.Array:
    """Per-row sha256(content) hexdigest (the ingest invariant) hashing Arrow
    buffer slices directly — no Python str materialization / re-encode of the
    corpus (that cost a full extra pass + object churn per batch)."""
    from ..functions.hashing import _string_view

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        import pyarrow.compute as pc

        col = pc.fill_null(col, "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    offs, data = _string_view(col)
    mv = memoryview(data) if data.size else memoryview(b"")
    sha256 = hashlib.sha256
    return pa.array(
        [sha256(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(col))],
        type=pa.string(),
    )


class TokenizeStage:
    """Stateless ``map_batches`` stage: normalize + tokenize + drop content.

    Emits one row per input doc:
      __id__, shard, dl, [content_sha256], terms (list<str> unique terms),
      tfs (list<int32>), [positions flattened varint-ready], stored cols.
    """

    def __init__(
        self,
        cfg: IndexConfig,
        shard_offset: int = 0,
        emit_dictionary: bool = False,
        skip_shard: bool = False,
    ):
        self.cfg = cfg
        self.shard_offset = shard_offset
        self.skip_shard = skip_shard
        # fused-path option: emit terms as list<dictionary<string>> so the
        # SegmentBuilder reuses the codes directly — no per-run string
        # materialization and no second dictionary_encode pass (cuts the
        # build task's memory traffic; only safe when tokenize+build run in
        # the SAME task, i.e. the zero-shuffle file layout)
        self.emit_dictionary = emit_dictionary
        self._tokenizer = make_tokenizer(
            cfg.analyzer, cfg.ascii_folding, self._stem_for(cfg.text_col)
        )
        self._field_tokenizers = {
            f: make_tokenizer(cfg.analyzer, cfg.ascii_folding, self._stem_for(f))
            for f in cfg.text_fields
        }

    def _stem_for(self, field_name: str) -> str | None:
        """Per-field stemming (MerescoDutchStemmingAnalyzer.java:49-66):
        ``stem`` applies to all text fields unless ``stem_fields`` names a
        subset."""
        cfg = self.cfg
        if not cfg.stem:
            return None
        if cfg.stem_fields and field_name not in cfg.stem_fields:
            return None
        return cfg.stem

    # chars whose Unicode LOWERCASE maps into [a-z0-9_] without being
    # [A-Za-z0-9_] themselves: İ (U+0130 → "i" + U+0307) and K (U+212A → "k").
    # Exhaustively verified over every Unicode codepoint by
    # tests/test_tokenize_paths.py::test_split_first_equivalence_all_codepoints.
    _UNSAFE_LOWER_RE = UNSAFE_LOWER_RE  # alias: the one copy lives in analysis

    def _tokens_arrow(self, col: pa.ChunkedArray, _force: str | None = None):
        """Arrow-native tokenization for the frozen default spec
        (tokens = regexp findall [a-z0-9_]+ over lower(text)) — everything in
        C, zero Python string objects.  Returns (codes int64, doc_idx,
        pos_in_doc, dictionary StringArray, dl int32).

        Bandwidth diet (the 8→32 scaling bottleneck is one socket's memory
        bandwidth, BASELINE.md): the default path splits the ORIGINAL text
        case-insensitively and lowercases only the token DICTIONARY (tiny),
        merging case-collided entries — the full-corpus lowered copy and the
        empty-token filter rewrite of the values buffer never happen.  Only
        İ/K (see _UNSAFE_LOWER_RE) break the reorder; batches containing
        them fall back to the lower-first path."""
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = pc.fill_null(col, "")
        r = lowered_token_codes(col, _force)
        if r is not None:
            # byte-table scan + dictionary-space lower (the ONE shared copy
            # in analysis.lowered_token_codes): ~2× the RE2 split, yields no
            # empty tokens, no full-corpus lowered copy
            codes, doc_idx, dictionary = r
        else:
            lower = pc.utf8_lower(col)
            lists = pc.split_pattern_regex(lower, pattern="[^a-z0-9_]+")
            lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
            offsets = lists.offsets.to_numpy(zero_copy_only=False)
            values = lists.values
            n_per_doc = np.diff(offsets)
            doc_idx = np.repeat(np.arange(len(lists), dtype=np.int32), n_per_doc)
            nonempty = pc.not_equal(pc.binary_length(values), 0).to_numpy(zero_copy_only=False)
            enc = pc.dictionary_encode(values.filter(pa.array(nonempty)))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)  # int32 from arrow
            doc_idx = doc_idx[nonempty]
            dictionary = enc.dictionary
        # kept tokens stay doc-contiguous and ordered → position within doc =
        # global rank − doc's first rank.  int32 end to end (token count per
        # batch « 2^31), computed in place: the former int64 arange + int64
        # gather + int32 downcast was 3 full-width temporaries of churn
        dl64 = np.bincount(doc_idx, minlength=len(col))
        doc_starts = np.concatenate(([0], np.cumsum(dl64)[:-1])).astype(np.int32)
        pos_in_doc = np.arange(doc_idx.size, dtype=np.int32)
        pos_in_doc -= doc_starts[doc_idx]
        return codes, doc_idx, pos_in_doc, dictionary, dl64.astype(np.int32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.schema.metadata:  # pandas parquet metadata makes schemas unhashable
            batch = batch.replace_schema_metadata(None)
        cfg = self.cfg
        # __id__ built in Arrow (C string join), no Python string objects
        if cfg.id_col:
            ids_arr = batch[cfg.id_col]
            if not pa.types.is_string(ids_arr.type):
                ids_arr = pc.cast(ids_arr, pa.string())
        else:
            parts = [
                batch[c] if pa.types.is_string(batch[c].type) else pc.cast(batch[c], pa.string())
                for c in cfg.id_from
            ]
            ids_arr = pc.binary_join_element_wise(*parts, ":")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        if ids_arr.null_count:
            ids_arr = pc.fill_null(ids_arr, "None")  # str(None) parity
        ndocs = len(batch)

        if cfg.text_fields:
            return self._call_multifield(batch, ids_arr, ndocs)

        inv, doc_idx, pos_in_doc, dictionary, dl = self._flat_tokens(
            batch[cfg.text_col], cfg.text_col
        )

        if inv.size:
            # single-key stable sort on (doc, term): input is already
            # pos-ascending within each doc, and stable sort preserves it —
            # one argsort instead of lexsort's three passes (memory-bound).
            # Key built IN PLACE: `doc*n_dict + inv` as three expressions
            # allocated three full-width int64 temporaries
            n_dict = int(inv.max()) + 1
            key = doc_idx.astype(np.int64)
            key *= n_dict
            key += inv
            order = np.argsort(key, kind="stable")
            del key
            di, ti, pi = doc_idx[order], inv[order], pos_in_doc[order]
            run_start = np.ones(di.size, dtype=bool)
            run_start[1:] = (di[1:] != di[:-1]) | (ti[1:] != ti[:-1])
            run_ids = np.flatnonzero(run_start)
            run_bounds = np.concatenate((run_ids, [di.size]))
            run_tf = np.diff(run_bounds).astype(np.int32)
            runs_per_doc = np.bincount(di[run_ids], minlength=ndocs)
        else:
            run_ids = np.empty(0, dtype=np.int64)
            run_bounds = np.zeros(1, dtype=np.int64)
            run_tf = np.empty(0, dtype=np.int32)
            runs_per_doc = np.zeros(ndocs, dtype=np.int64)
            ti = np.empty(0, dtype=np.int64)
            pi = np.empty(0, dtype=np.int64)

        outer_off = np.concatenate(([0], np.cumsum(runs_per_doc))).astype(np.int32)
        if self.emit_dictionary:
            dict_sa = (
                dictionary
                if dictionary.type == pa.string()
                else dictionary.cast(pa.string())
            )
            term_values = pa.DictionaryArray.from_arrays(
                pa.array(ti[run_ids].astype(np.int32, copy=False), type=pa.int32())
                if run_ids.size
                else pa.array([], type=pa.int32()),
                dict_sa,
            )
        else:
            term_values = (
                pa.compute.take(dictionary, pa.array(ti[run_ids]))
                if run_ids.size
                else pa.array([], type=pa.string())
            )
            if term_values.type != pa.string():
                term_values = term_values.cast(pa.string())
        terms_col = pa.ListArray.from_arrays(pa.array(outer_off), term_values)
        tfs_col = pa.ListArray.from_arrays(pa.array(outer_off), pa.array(run_tf))

        if self.skip_shard:
            # fused zero-shuffle layout: the caller overwrites the shard
            # column with the file-unit id — skip the per-id crc32 loop
            shard_arr = pa.array(np.zeros(ndocs, dtype=np.int32))
        else:
            ids_py = ids_arr.to_pylist()
            shard_arr = pa.array(
                _shard_of(ids_py, cfg.num_shards) + np.int32(self.shard_offset)
            )
        cols: dict[str, Any] = {
            "__id__": ids_arr,
            "shard": shard_arr,
            "dl": pa.array(dl),
            "terms": terms_col,
            "tfs": tfs_col,
        }
        if cfg.store_positions:
            inner = pa.ListArray.from_arrays(
                pa.array(run_bounds.astype(np.int32, copy=False)),
                pa.array(pi.astype(np.int32, copy=False)),
            )
            cols["positions"] = pa.ListArray.from_arrays(pa.array(outer_off), inner)
        if cfg.hash_content:
            cols["content_sha256"] = _sha256_column(batch[cfg.text_col])
        for c in cfg.stored_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    def _flat_tokens(self, col, field_name: str):
        """Tokenize one column → flat (inv codes, doc_idx, pos_in_doc,
        dictionary, dl) — the Arrow fast path when the field's effective
        analyzer is the frozen default, else the python tokenizer."""
        cfg = self.cfg
        if (
            cfg.analyzer == "standard"
            and not cfg.ascii_folding
            and self._stem_for(field_name) is None
        ):
            return self._tokens_arrow(col)
        texts = col.to_pylist()
        ndocs = len(texts)
        tokenizer = self._field_tokenizers.get(field_name, self._tokenizer)
        toks = tokenizer(texts)
        dl = np.fromiter((len(t) for t in toks), dtype=np.int32, count=ndocs)
        from itertools import chain

        flat = np.array(list(chain.from_iterable(toks)), dtype=object)
        lengths = dl.astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lengths)
        pos_in_doc = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lengths)
        if flat.size:
            import pandas as pd

            inv, uniques = pd.factorize(flat, sort=False)
            dictionary = pa.array(np.asarray(uniques, dtype=object), type=pa.string())
        else:
            inv = np.empty(0, dtype=np.int64)
            dictionary = pa.array([], type=pa.string())
        return inv, doc_idx, pos_in_doc, dictionary, dl

    def _field_runs(self, col, field_name: str, prefix: str, ndocs: int) -> dict:
        """One field's (doc, term) runs: tokenize, sort by (doc, term), and
        collapse to per-posting runs.  ``prefix`` ("" for the default field)
        is applied in DICTIONARY space before the run gather, so prefixed
        term strings are built once per distinct term, not per posting.
        Runs stay as (code, dictionary) pairs — the caller concatenates the
        per-field dictionaries with code offsets, preserving the
        dictionary-encoded fast path downstream (emit_dictionary)."""
        import pyarrow.compute as pc

        inv, doc_idx, pos_in_doc, dictionary, dl = self._flat_tokens(col, field_name)
        if dictionary.type != pa.string():
            dictionary = dictionary.cast(pa.string())
        if isinstance(dictionary, pa.ChunkedArray):
            dictionary = dictionary.combine_chunks()
        if len(dictionary) and pc.any(
            pc.match_substring(dictionary, "\x1f")
        ).as_py():
            # the concatenated multifield dictionary's uniqueness (required
            # by the code-reuse rank-remap and the sorted-terms bisect)
            # depends on no token containing the reserved separator — true
            # for the built-in [a-z0-9_]+ tokenizers, enforced here for
            # custom analyzers (the check scans DISTINCT terms, not tokens)
            raise ValueError(
                f"analyzer for field {field_name!r} emitted a token containing "
                "the reserved field separator U+001F; strip or replace it in "
                "the custom analyzer"
            )
        if prefix and len(dictionary):
            dictionary = pc.binary_join_element_wise(
                pa.scalar(prefix), dictionary, ""
            )
        if inv.size:
            n_dict = int(inv.max()) + 1
            order = np.argsort(doc_idx.astype(np.int64) * n_dict + inv, kind="stable")
            di, ti, pi = doc_idx[order], inv[order], pos_in_doc[order]
            run_start = np.ones(di.size, dtype=bool)
            run_start[1:] = (di[1:] != di[:-1]) | (ti[1:] != ti[:-1])
            run_ids = np.flatnonzero(run_start)
            run_bounds = np.concatenate((run_ids, [di.size]))
            run_tf = np.diff(run_bounds).astype(np.int32)
            run_code = ti[run_ids].astype(np.int64)
            run_doc = di[run_ids].astype(np.int64)
            pos_start = run_ids.astype(np.int64)
        else:
            run_tf = np.empty(0, dtype=np.int32)
            run_code = np.empty(0, dtype=np.int64)
            run_doc = np.empty(0, dtype=np.int64)
            pos_start = np.empty(0, dtype=np.int64)
            pi = np.empty(0, dtype=np.int64)
        return {
            "run_doc": run_doc,
            "run_code": run_code,
            "dictionary": dictionary,
            "run_tf": run_tf,
            "pos_flat": pi.astype(np.int32),
            "pos_start": pos_start,
            "dl": dl,
        }

    def _call_multifield(self, batch: pa.Table, ids_arr, ndocs: int) -> pa.Table:
        """Multi-field tokenize: each text field's runs are built
        independently (its own analyzer, positions and dl), extra fields'
        terms are dictionary-prefixed with "<field>\\x1f", and the per-doc
        run lists are interleaved field-major by one stable argsort — the
        per-field-postings data model of DocumentStringToDocument.java:84-158
        in ONE term dictionary."""
        from ..query.ast import FIELD_SEP

        cfg = self.cfg
        specs = [(cfg.text_col, "")] + [(f, f + FIELD_SEP) for f in cfg.text_fields]
        parts = [self._field_runs(batch[f], f, pfx, ndocs) for f, pfx in specs]

        run_doc_cat = np.concatenate([p["run_doc"] for p in parts])
        run_tf_cat = np.concatenate([p["run_tf"] for p in parts])
        # absolute position-span starts in the concatenated pos_flat buffer
        pos_base = np.cumsum([0] + [p["pos_flat"].size for p in parts[:-1]])
        pos_start_cat = np.concatenate(
            [p["pos_start"] + b for p, b in zip(parts, pos_base)]
        )
        pos_flat_cat = np.concatenate([p["pos_flat"] for p in parts])
        # ONE combined dictionary: per-field dictionaries are internally
        # unique and the field prefixes make them disjoint across fields, so
        # concatenation stays a valid unique dictionary; per-field codes
        # shift by the preceding dictionaries' sizes
        dict_cat = pa.concat_arrays([p["dictionary"] for p in parts])
        code_base = np.cumsum([0] + [len(p["dictionary"]) for p in parts[:-1]])
        run_code_cat = np.concatenate(
            [p["run_code"] + b for p, b in zip(parts, code_base)]
        )
        # stable sort by doc: concatenation is field-major, so within a doc
        # the default field's runs come first, then each extra field's —
        # deterministic and order-preserving within a field
        order = np.argsort(run_doc_cat, kind="stable")
        runs_per_doc = np.bincount(run_doc_cat, minlength=ndocs)
        outer_off = np.concatenate(([0], np.cumsum(runs_per_doc))).astype(np.int32)
        codes_ordered = run_code_cat[order]
        if self.emit_dictionary:
            term_values = pa.DictionaryArray.from_arrays(
                pa.array(codes_ordered.astype(np.int32), type=pa.int32()), dict_cat
            )
        else:
            term_values = pa.compute.take(dict_cat, pa.array(codes_ordered))
            if isinstance(term_values, pa.ChunkedArray):
                term_values = term_values.combine_chunks()
        run_tf = run_tf_cat[order]
        terms_col = pa.ListArray.from_arrays(pa.array(outer_off), term_values)
        tfs_col = pa.ListArray.from_arrays(pa.array(outer_off), pa.array(run_tf))

        cols: dict[str, Any] = {
            "__id__": ids_arr,
            "shard": pa.array(np.zeros(ndocs, dtype=np.int32))
            if self.skip_shard
            else pa.array(
                _shard_of(ids_arr.to_pylist(), cfg.num_shards)
                + np.int32(self.shard_offset)
            ),
            "dl": pa.array(parts[0]["dl"]),
            "terms": terms_col,
            "tfs": tfs_col,
        }
        for (f, _), p in zip(specs[1:], parts[1:]):
            cols[f"__dl__{f}"] = pa.array(p["dl"])
        if cfg.store_positions:
            L = run_tf.astype(np.int64)
            total = int(L.sum())
            # all fields of all docs empty → L is EMPTY; the concat form
            # yields [0] (len 1 ≠ len 0) and breaks the np.repeat below
            # (multifield twin of the build_segment / merge guards)
            out_starts = (
                np.concatenate(([0], np.cumsum(L)[:-1])).astype(np.int64)
                if L.size
                else np.zeros(0, dtype=np.int64)
            )
            gather = np.repeat(pos_start_cat[order], L) + (
                np.arange(total, dtype=np.int64) - np.repeat(out_starts, L)
            )
            flat = pos_flat_cat[gather] if total else np.empty(0, dtype=np.int32)
            inner = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(L))).astype(np.int32)),
                pa.array(flat.astype(np.int32)),
            )
            cols["positions"] = pa.ListArray.from_arrays(pa.array(outer_off), inner)
        if cfg.hash_content:
            cols["content_sha256"] = _sha256_column(batch[cfg.text_col])
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
            if t.schema.metadata:
                t = t.replace_schema_metadata(None)
            return t.append_column("shard", pa.array(np.full(len(t), shard, dtype=np.int32)))

        # ---- upsert dedup: last-write-wins per __id__ (dedup by sorted order,
        # keep the lexicographically-last row id occurrence deterministically).
        # Arrow stable sort + adjacent-compare — no Python string objects.
        import pyarrow.compute as pc_

        ids_arr = group["__id__"].combine_chunks()
        order = pc_.sort_indices(ids_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        # keep LAST occurrence per id in input order among equal ids:
        # Arrow sort is stable → take the last of each equal-key run
        sorted_ids = ids_arr.take(pa.array(order))
        is_last = np.ones(len(sorted_ids), dtype=bool)
        if len(sorted_ids) > 1:
            is_last[:-1] = pc_.not_equal(
                sorted_ids.slice(0, len(sorted_ids) - 1), sorted_ids.slice(1)
            ).to_numpy(zero_copy_only=False)
        keep = order[is_last]  # sorted unique ids, local docid = 0..n-1 in id order
        n = keep.size
        docids_global = (np.uint64(shard) << np.uint64(SHARD_BITS)) | np.arange(n, dtype=np.uint64)

        group = group.take(pa.array(keep))
        dl = group["dl"].to_numpy(zero_copy_only=False).astype(np.int32)

        # ---- flatten per-doc term lists, vectorized posting construction
        terms_col = group["terms"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        import pyarrow.compute as pc_

        t_offsets = terms_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(t_offsets)
        # postings count per segment « 2^31 (one build unit): int32 index
        # arrays + zero-copy int32 Arrow buffers — the former uint64/int64
        # upcasts here and in the position gather were the build task's
        # largest memory traffic (codec casts to uint64 at its boundary)
        flat_tfs = tfs_col.values.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int32), lengths)

        # Arrow dictionary-encode the term strings (C, no Python objects),
        # then rank-remap codes so the term dictionary comes out
        # lexicographically sorted (the searcher's prefix scan bisects it).
        # When the fused tokenize stage already emitted dictionary-encoded
        # terms (emit_dictionary=True), reuse its codes directly — the
        # re-encode pass was round 1's largest avoidable memory traffic.
        inner_vals = terms_col.values
        if pa.types.is_dictionary(inner_vals.type):
            codes = inner_vals.indices.to_numpy(zero_copy_only=False)
            dict_arr = inner_vals.dictionary
            # the tokenize dictionary may carry entries whose only docs were
            # dropped by the upsert dedup — compact to PRESENT terms so df
            # rows and the term dictionary stay aligned
            used = np.zeros(len(dict_arr), dtype=bool)
            used[codes] = True
            if not used.all():
                remap = (np.cumsum(used) - 1).astype(np.int32)
                codes = remap[codes]
                dict_arr = dict_arr.filter(pa.array(used))
        else:
            enc = pc_.dictionary_encode(inner_vals)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            dict_arr = enc.dictionary
        rank_order = pc_.sort_indices(dict_arr).to_numpy(zero_copy_only=False)
        rank = np.empty(rank_order.size, dtype=np.int32)
        rank[rank_order] = np.arange(rank_order.size, dtype=np.int32)
        term_ids = rank[codes]
        uniq_sorted_arrow = pc_.take(dict_arr, pa.array(rank_order))

        # docs are docid-ascending in input → stable sort on term alone
        sort = np.argsort(term_ids, kind="stable")
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

        rows_term = uniq_sorted_arrow
        rows_df = np.diff(bounds).astype(np.int64)
        # ONE uint64 cast shared by the cf sum (overflow-safe past int32) and
        # the codec, which requires uint64 and then copies nothing
        tf64 = tf_sorted.astype(np.uint64)
        rows_cf = (
            np.add.reduceat(tf64, bounds[:-1]).astype(np.int64)
            if t_sorted.size
            else np.zeros(0, dtype=np.int64)
        )

        # one vectorized encode pass for the whole segment's postings
        # (dls feed the per-block max(tf/dl) bound for block-max pruning)
        docs_col, tfs_col_enc, blk_last, blk_maxtf, blk_doc_off, blk_tf_off, blk_maxtfdl = (
            encode_segment_postings(
                term_starts, docids_global[d_sorted], tf64, dls=dl[d_sorted]
            )
        )

        pos_col, pos_offs = None, None
        if cfg.store_positions:
            pcol = group["positions"].combine_chunks()
            inner = pcol.values  # list<int32> per (doc, term) posting, doc-major order
            inner_off = inner.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            inner_vals = inner.values.to_numpy(zero_copy_only=False)  # int32, zero-copy
            inner_len = np.diff(inner_off)
            # gather position spans into (term, doc) posting order
            L = inner_len[sort]
            # L can be EMPTY (a shard whose docs all tokenize to zero tokens);
            # the concatenate form would yield [0] (len 1 ≠ len 0) and break
            # the np.repeat below.
            out_starts = (
                np.concatenate(([0], np.cumsum(L)[:-1])).astype(np.int64)
                if L.size
                else np.zeros(0, dtype=np.int64)
            )
            total = int(L.sum())
            # int32 gather indices (position count per segment « 2^31; int64
            # fallback guards the pathological case), built IN PLACE — the
            # one-expression form held four full-width int64 temporaries
            idt = np.int32 if total < 2**31 else np.int64
            # order matters for int32: arange − out_start first (a small
            # within-posting offset), THEN + span_start — every intermediate
            # stays < total, so no int32 overflow below the 2^31 gate
            gather = np.arange(total, dtype=idt)
            gather -= np.repeat(out_starts.astype(idt, copy=False), L)
            gather += np.repeat(inner_off[:-1][sort].astype(idt, copy=False), L)
            positions_flat = inner_vals[gather]
            pos_col, pos_offs = encode_segment_positions(bounds, positions_flat, out_starts)

        post_cols = {
            "term": rows_term.cast(pa.string())
            if rows_term.type != pa.string()
            else rows_term,
            "df": pa.array(rows_df, type=pa.int64()),
            "cf": pa.array(rows_cf, type=pa.int64()),
            "docs": docs_col,
            "tfs": tfs_col_enc,
            "blk_last": blk_last,
            "blk_maxtf": blk_maxtf,
            "blk_doc_off": blk_doc_off,
            "blk_tf_off": blk_tf_off,
        }
        if blk_maxtfdl is not None:
            post_cols["blk_maxtfdl"] = blk_maxtfdl
        if cfg.store_positions:
            post_cols["pos"] = pos_col
            post_cols["pos_offs"] = pos_offs
        postings = pa.table(post_cols)

        doc_cols = {
            "docid": pa.array(docids_global.astype(np.int64)),
            "__id__": group["__id__"],
            "dl": pa.array(dl),
        }
        for c in group.column_names:
            if c.startswith("__dl__"):  # per-field doc lengths (field-scoped BM25)
                doc_cols[c] = group[c]
        if cfg.hash_content and "content_sha256" in group.column_names:
            doc_cols["content_sha256"] = group["content_sha256"]
        if cfg.store_termvectors:
            # per-doc (term, tf) vectors — list<str>/list<int32>; the fused
            # path's dictionary-encoded values round-trip through parquet
            doc_cols["tv_terms"] = group["terms"]
            doc_cols["tv_tfs"] = group["tfs"]
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


def _read_marker(seg_dir: str) -> dict | None:
    marker = os.path.join(seg_dir, "_SUCCESS")
    if not os.path.exists(marker):
        return None
    import json

    with open(marker) as f:
        content = f.read().strip()
    try:
        return json.loads(content)
    except ValueError:
        return {"fingerprint": content}


def _segment_complete(seg_dir: str, fingerprint: str) -> bool:
    m = _read_marker(seg_dir)
    return m is not None and m.get("fingerprint") == fingerprint


def _atomic_write_segment(seg_dir: str, fingerprint: str, postings: pa.Table, docs: pa.Table) -> None:
    """Atomic publish (tmp dir + rename); the _SUCCESS marker carries the
    lineage fingerprint AND the segment's stats so manifest assembly never
    re-reads segment files (O(segments) tiny JSON reads, not column scans)."""
    import json

    tmp = seg_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
    pq.write_table(docs, os.path.join(tmp, "docs.parquet"))
    stats = {
        "fingerprint": fingerprint,
        "num_docs": len(docs),
        "sum_dl": int(pa.compute.sum(docs["dl"]).as_py() or 0),
        "num_terms": len(postings),
    }
    dl_fields = {
        c[len("__dl__"):]: int(pa.compute.sum(docs[c]).as_py() or 0)
        for c in docs.column_names
        if c.startswith("__dl__")
    }
    if dl_fields:
        stats["sum_dl_fields"] = dl_fields
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        json.dump(stats, f)
    shutil.rmtree(seg_dir, ignore_errors=True)
    os.replace(tmp, seg_dir)


def add_documents(ds, index_dir: str, cfg: IndexConfig | None = None) -> IndexManifest:
    """Incremental add/upsert: build NEW segments (shard ids after the
    existing ones, mirroring Lucene's per-segment docid spaces) and tombstone
    the re-added ``__id__``s in older segments — updateDocument semantics
    (Lucene.java:166-171) without rewriting old segments.

    Like Lucene, deleted docs still count in df/term stats until a merge
    rewrites the segments (merge_index applies tombstones).
    Scale note: the tombstone list is the new batch's id set; segment loads
    apply it through the bloom-pre-filtered vectorized
    :class:`..index.tombstones.TombstoneSet`, loaded per actor — the driver
    never materializes the set."""
    manifest = IndexManifest.load(index_dir)
    cfg = cfg or IndexConfig(**manifest.config)
    base_cfg = IndexConfig(**manifest.config)
    if cfg.fingerprint() != base_cfg.fingerprint():
        raise ValueError(
            "add_documents config is semantically incompatible with the index "
            f"(fingerprint {cfg.fingerprint()} != {base_cfg.fingerprint()}); "
            "changing analyzer/stored_cols/etc requires a rebuild"
        )
    offset = max((s.shard for s in manifest.segments), default=-1) + 1

    tokenized = ds.map_batches(
        TokenizeStage(cfg, shard_offset=offset), batch_format="pyarrow", batch_size=1024
    )
    builder = SegmentBuilder(index_dir, cfg)

    def build_segment(group: pa.Table) -> pa.Table:
        return builder(group)

    tokenized.groupby("shard").map_groups(build_segment, batch_format="pyarrow").materialize()

    # tombstone the new ids against all pre-existing shards
    new_ids: list[str] = []
    for name in sorted(os.listdir(os.path.join(index_dir, "segments"))):
        # skip leftover 'seg=NNNNN.tmp' dirs from interrupted builds (mirrors
        # _publish_manifest's marker-based filtering)
        m = re.fullmatch(r"seg=(\d+)", name)
        if m is None:
            continue
        shard = int(m.group(1))
        if shard >= offset:
            t = pq.read_table(
                os.path.join(index_dir, "segments", name, "docs.parquet"), columns=["__id__"]
            )
            new_ids.extend(t["__id__"].to_pylist())
    append_tombstones(index_dir, new_ids, before_shard=offset)
    return _publish_manifest(index_dir, cfg, bump_from=manifest)


def delete_documents(index_dir: str, ids: list[str]) -> IndexManifest:
    """Delete by ``__id__`` (Lucene.deleteDocument analog, Lucene.java:173-181):
    tombstones applied to every current segment."""
    manifest = IndexManifest.load(index_dir)
    max_shard = max((s.shard for s in manifest.segments), default=-1) + 1
    append_tombstones(index_dir, ids, before_shard=max_shard)
    cfg = IndexConfig(**manifest.config)
    return _publish_manifest(index_dir, cfg, bump_from=manifest)


def delete_by_query(index_dir: str, query, searcher=None) -> IndexManifest:
    """Delete every doc matching ``query`` (Lucene.delete(luceneQuery=...),
    meresco/lucene/_lucene.py:81-90 / IndexWriter.deleteDocuments(Query)):
    collect matching ids through the searcher, then tombstone them.

    ``searcher`` reuses a serving :class:`~..query.engine.IndexSearcher`
    (the writer+reader pairing the reference keeps in ``Lucene``); without
    one a temporary single-actor searcher opens the current manifest.
    Scale note: tombstones are O(matches) — for match-most deletions run
    ``merge_index`` with an exclusion filter instead."""
    temp = None
    if searcher is None:
        from ..query.engine import IndexSearcher

        searcher = temp = IndexSearcher(index_dir, num_actors=1)
    try:
        ids = searcher.matching_ids(query)
    finally:
        if temp is not None:
            temp.close()  # eager actor release (see IndexSearcher.close)
    if not ids:
        return IndexManifest.load(index_dir)
    return delete_documents(index_dir, ids)


def append_tombstones(index_dir: str, ids: list[str], before_shard: int) -> None:
    if not ids:
        return
    path = os.path.join(index_dir, "tombstones.parquet")
    new = pa.table(
        {
            "__id__": pa.array(ids, type=pa.string()),
            "before_shard": pa.array(np.full(len(ids), before_shard, dtype=np.int32)),
        }
    )
    if os.path.exists(path):
        new = pa.concat_tables([pq.read_table(path), new])
    tmp = path + ".tmp"
    pq.write_table(new, tmp)
    os.replace(tmp, path)


def load_tombstones(index_dir: str) -> dict[str, int]:
    """id -> highest before_shard (deleted in all shards below it).

    LEGACY/test helper: the query engine and merge no longer call this on
    the driver — they hand tasks/actors the parquet path and use the
    bloom-filtered vectorized :class:`..index.tombstones.TombstoneSet`."""
    path = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(path):
        return {}
    t = pq.read_table(path)
    out: dict[str, int] = {}
    for i, b in zip(t["__id__"].to_pylist(), t["before_shard"].to_pylist()):
        out[i] = max(out.get(i, 0), int(b))
    return out


# files below this count have their parquet footers read serially on the
# driver (cheaper than a Ray stage); at/above it footer reads fan out as a
# map_batches over the path list — at the 10^6-file design point planning is
# bounded by cluster parallelism, never a serial driver metadata loop
PLAN_PARALLEL_MIN_FILES = int(os.environ.get("MLR_PLAN_PARALLEL_MIN", "64"))


def _footer_rg_rows(path: str) -> list[int]:
    md = pq.read_metadata(path)
    return [md.row_group(i).num_rows for i in range(md.num_row_groups)]


def _collect_rg_rows(paths: list[str]) -> dict[str, list[int]]:
    """path → per-row-group row counts.  The driver only assembles the
    (tiny, one-row-per-file) result; past PLAN_PARALLEL_MIN_FILES the
    footer reads themselves run distributed."""
    if len(paths) < PLAN_PARALLEL_MIN_FILES:
        return {p: _footer_rg_rows(p) for p in paths}
    import ray.data as rd

    def read_footers(batch: pa.Table) -> pa.Table:
        ps = batch["path"].to_pylist()
        return pa.table(
            {
                "path": pa.array(ps, type=pa.string()),
                "rg_rows": pa.array(
                    [_footer_rg_rows(p) for p in ps], type=pa.list_(pa.int64())
                ),
            }
        )

    rows = (
        rd.from_items([{"path": p} for p in paths])
        .map_batches(read_footers, batch_format="pyarrow", batch_size=128)
        .take_all()
    )
    return {r["path"]: list(r["rg_rows"]) for r in rows}


def _plan_file_units(paths: list[str], target_docs: int) -> list[dict]:
    """Split input parquet files into (path, row-group range[, row slice])
    units of ~target_docs rows — the segment planning step.  A row group
    larger than 2×target is sub-split by row ranges so parallelism never
    degrades to the writer's row-group size.  Unit order (and thus shard ids
    and docids) is deterministic: sorted by path, then range.  Footer reads
    run distributed past PLAN_PARALLEL_MIN_FILES (see _collect_rg_rows)."""
    units: list[dict] = []
    rg_by_path = _collect_rg_rows(paths)
    for path in sorted(paths):
        rg_rows = rg_by_path[path]
        start = 0
        acc = 0
        for i, nrows in enumerate(rg_rows):
            if nrows >= 2 * target_docs:
                # flush any accumulated smaller groups first
                if acc:
                    units.append(
                        {"path": path, "rg_start": start, "rg_end": i, "row_start": -1, "row_len": -1, "rows": acc}
                    )
                # sub-split the big row group by row ranges
                nsplits = (nrows + target_docs - 1) // target_docs
                per = (nrows + nsplits - 1) // nsplits
                for off in range(0, nrows, per):
                    ln = min(per, nrows - off)
                    units.append(
                        {"path": path, "rg_start": i, "rg_end": i + 1, "row_start": off, "row_len": ln, "rows": ln}
                    )
                start = i + 1
                acc = 0
                continue
            acc += nrows
            if acc >= target_docs or i == len(rg_rows) - 1:
                if acc:
                    units.append(
                        {"path": path, "rg_start": start, "rg_end": i + 1, "row_start": -1, "row_len": -1, "rows": acc}
                    )
                start = i + 1
                acc = 0
    for i, u in enumerate(units):
        u["shard"] = i
    return units


class FileSegmentBuilder:
    """Zero-shuffle build task: one (file, row-group range) unit → one
    segment.  Tokenize and posting construction are FUSED in the task, so the
    fat tokenized intermediate never enters the object store — at 100 TB the
    only data movement is the original parquet read.

    This is the default layout.  It assumes ``__id__`` values are unique
    across the corpus (duplicate ids are NOT upserted across units — use
    layout="hash" for a last-write-wins shuffle dedup, or run exact_dedup
    first).  The reference behaves identically when ids are unique
    (updateDocument == addDocument, Lucene.java:166-171)."""

    def __init__(self, index_dir: str, cfg: IndexConfig):
        self.index_dir = index_dir
        self.cfg = cfg
        # fused in-task handoff: dictionary-encoded terms, no re-encode; the
        # shard column is overwritten with the unit id → skip per-id crc32
        self._tokenize = TokenizeStage(cfg, emit_dictionary=True, skip_shard=True)
        self._builder = SegmentBuilder(index_dir, cfg)

    def __call__(self, batch) -> pa.Table:
        out = []
        for path, rg_start, rg_end, row_start, row_len, shard in zip(
            batch["path"],
            batch["rg_start"],
            batch["rg_end"],
            batch["row_start"],
            batch["row_len"],
            batch["shard"],
        ):
            f = pq.ParquetFile(path)
            cols = [
                self.cfg.text_col,
                *self.cfg.text_fields,
                *self.cfg.id_from,
                *self.cfg.stored_cols,
            ]
            if self.cfg.id_col:
                cols.append(self.cfg.id_col)
            # prune at the read: only the needed columns leave storage
            table = f.read_row_groups(
                list(range(int(rg_start), int(rg_end))), columns=list(dict.fromkeys(cols))
            )
            if int(row_start) >= 0:
                table = table.slice(int(row_start), int(row_len))
            tokenized = self._tokenize(table)
            shard_col = np.full(len(tokenized), int(shard), dtype=np.int32)
            tokenized = tokenized.set_column(
                tokenized.schema.get_field_index("shard"), "shard", pa.array(shard_col)
            )
            out.append(self._builder(tokenized))
        return pa.concat_tables(out, promote_options="default")


def build_index(
    source,
    index_dir: str,
    cfg: IndexConfig | None = None,
    target_docs_per_segment: int = 250_000,
) -> IndexManifest:
    """Build a sharded inverted index; returns the manifest.

    ``source``: parquet path(s) → zero-shuffle file-partitioned build (one
    segment per ~target_docs_per_segment rows; deterministic docids from the
    file/row-group order; resumable per unit); or a ray.data.Dataset → the
    hash-sharded ``groupby(shard)`` build with last-write-wins upsert dedup.
    """
    if isinstance(source, (str, list, tuple)):
        return _build_index_from_files(
            [source] if isinstance(source, str) else list(source),
            index_dir,
            cfg,
            target_docs_per_segment,
        )
    return _build_index_from_dataset(source, index_dir, cfg)


def _expand_paths(paths: list[str]) -> list[str]:
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            out.append(p)
    return out


def _build_index_from_files(
    paths: list[str], index_dir: str, cfg: IndexConfig | None, target_docs: int
) -> IndexManifest:
    import ray.data as rd

    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    units = _plan_file_units(_expand_paths(paths), target_docs)
    term_rows = (
        rd.from_items(units)
        .map_batches(
            FileSegmentBuilder(index_dir, cfg),
            batch_format="numpy",
            batch_size=1,
        )
        .materialize()
    )
    return _finish_build(term_rows, index_dir, cfg)


def _build_index_from_dataset(ds, index_dir: str, cfg: IndexConfig | None = None) -> IndexManifest:
    """Hash-sharded build over a Dataset (the upsert-dedup path).

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
    return _finish_build(term_rows, index_dir, cfg)


def _finish_build(term_rows, index_dir: str, cfg: IndexConfig) -> IndexManifest:
    """Global term stats = groupby(term)-aggregate over per-segment rows.

    The rows are ALREADY per-segment combined (one row per distinct term per
    segment), so their count is tiny relative to the corpus; below a
    threshold a driver-side arrow groupby beats a Ray all-to-all by seconds
    of fixed shuffle overhead.  Past it (huge vocabularies), shuffle
    properly with the Ray groupby."""
    from ray.data.aggregate import Sum

    n_term_rows = term_rows.count()
    if n_term_rows <= 50_000_000:
        import ray as _ray

        blocks = [t for t in _ray.get(term_rows.to_arrow_refs()) if t.num_columns > 0]
        parts = pa.concat_tables(blocks, promote_options="default")
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

    return _publish_manifest(index_dir, cfg, num_terms=len(merged))


def _publish_manifest(
    index_dir: str,
    cfg: IndexConfig,
    bump_from: IndexManifest | None = None,
    num_terms: int | None = None,
) -> IndexManifest:
    """Scan completed segment dirs → manifest (the atomic 'commit').

    When called from add/delete (``bump_from``), term stats are recomputed
    driver-side from the segments' (term, df, cf) columns."""
    segments = []
    num_docs = 0
    sum_dl = 0
    sum_dl_fields: dict[str, int] = {}
    seg_root = os.path.join(index_dir, "segments")
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        if re.fullmatch(r"seg=\d+", name) is None:
            continue  # leftover seg=NNNNN.tmp from an interrupted build
        seg_dir = os.path.join(seg_root, name)
        m = _read_marker(seg_dir)
        if m is None or m.get("fingerprint") != cfg.fingerprint():
            continue
        if "num_docs" not in m:  # legacy marker: fall back to column scans
            dls = pq.read_table(os.path.join(seg_dir, "docs.parquet"), columns=["dl"])
            m["num_docs"] = len(dls)
            m["sum_dl"] = int(pa.compute.sum(dls["dl"]).as_py() or 0)
            m["num_terms"] = pq.read_metadata(os.path.join(seg_dir, "postings.parquet")).num_rows
        shard = int(name.split("=")[1])
        segments.append(
            SegmentInfo(
                shard=shard,
                num_docs=m["num_docs"],
                sum_dl=m["sum_dl"],
                num_terms=m["num_terms"],
                path=f"segments/{name}",
                fingerprint=cfg.fingerprint(),
            )
        )
        num_docs += m["num_docs"]
        sum_dl += m["sum_dl"]
        for f, v in (m.get("sum_dl_fields") or {}).items():
            sum_dl_fields[f] = sum_dl_fields.get(f, 0) + int(v)

    if bump_from is not None:
        parts = [
            pq.read_table(os.path.join(index_dir, s.path, "postings.parquet"), columns=["term", "df", "cf"])
            for s in segments
        ]
        merged = (
            pa.concat_tables(parts)
            .group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
            .sort_by("term")
            if parts
            else pa.table({"term": [], "df": [], "cf": []})
        )
        pq.write_table(merged, os.path.join(index_dir, "termstats.parquet"))
        num_terms = len(merged)

    metrics: dict = {"num_terms_global": num_terms}
    if sum_dl_fields:
        metrics["sum_dl_fields"] = sum_dl_fields  # per-field avgdl source
    manifest = IndexManifest(
        version=(bump_from.version + 1) if bump_from else 1,
        num_docs=num_docs,
        sum_dl=sum_dl,
        num_shards=cfg.num_shards,
        config=asdict(cfg),
        segments=segments,
        metrics=metrics,
    )
    manifest.save(index_dir)
    return manifest
