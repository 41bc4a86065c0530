"""Corpus source readers: one entry point over the formats a deployment
feeds the engine.

The reference ingests documents one HTTP POST at a time
(``src/.../http/UpdateHandler.java:44-56``); at 100 TB the corpus arrives
as files instead, and each format maps onto the matching Ray Data reader
so the streaming executor handles parallelism, pruning and backpressure:

- parquet → ``read_parquet`` (column projection pushed to the row groups
  — a read that loads all columns for a 2-column transform is wrong);
- jsonl / json → ``read_json``;
- csv / tsv → ``read_csv``;
- txt → ``read_text`` (one doc per line, column name ``text``).

Every reader drops pandas schema metadata at the source (see
``functions.hashing.strip_meta``) so downstream all-to-all ops keep
hashable — hence deduplicable — block schemas.
"""

from __future__ import annotations

import os
from typing import Sequence

import pyarrow as pa

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".jsonl": "jsonl",
    ".json": "jsonl",
    ".csv": "csv",
    ".tsv": "tsv",
    ".txt": "text",
}


def _detect_format(paths: Sequence[str]) -> str:
    exts = set()
    for p in paths:
        if os.path.isdir(p):
            for f in os.listdir(p):
                e = os.path.splitext(f)[1].lower()
                if e in _EXT_FORMAT:
                    exts.add(_EXT_FORMAT[e])
        else:
            e = os.path.splitext(p)[1].lower()
            if e in _EXT_FORMAT:
                exts.add(_EXT_FORMAT[e])
    if len(exts) != 1:
        raise ValueError(
            f"cannot auto-detect a single source format from {paths!r}: {sorted(exts)}"
        )
    return exts.pop()


def read_corpus(
    paths: str | Sequence[str],
    format: str = "auto",
    columns: Sequence[str] | None = None,
    **reader_kwargs,
):
    """Read a document corpus as a Ray ``Dataset``.

    ``columns`` prunes at the read for parquet (row-group projection) and
    via a fused select for the row-oriented formats (which cannot skip
    bytes on disk — prefer parquet at scale; this path exists for ingest
    compatibility)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    paths = list(paths)
    fmt = _detect_format(paths) if format == "auto" else format

    if fmt == "parquet":
        ds = rd.read_parquet(paths, columns=list(columns) if columns else None, **reader_kwargs)
    elif fmt == "jsonl":
        ds = rd.read_json(paths, **reader_kwargs)
    elif fmt in ("csv", "tsv"):
        if fmt == "tsv":
            from pyarrow import csv as pacsv

            reader_kwargs.setdefault(
                "parse_options", pacsv.ParseOptions(delimiter="\t")
            )
        ds = rd.read_csv(paths, **reader_kwargs)
    elif fmt == "text":
        ds = rd.read_text(paths, **reader_kwargs)
    else:
        raise ValueError(f"unknown source format {fmt!r}")

    want = list(columns) if columns else None

    def clean(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        if want and fmt != "parquet":
            t = t.select(want)
        return t

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
