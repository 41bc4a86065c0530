"""TermNumerator — global string→dense-int dictionary, Ray-Data-first.

The reference numerates join-key strings through a mutable
taxonomy-writer-backed singleton
(/root/reference/src/org/meresco/lucene/numerate/TermNumerator.java:39-78,
shared across all cores — LuceneHttpServer.java:96-101).  A mutable global
does not distribute; the Ray-native equivalent is a DERIVED, deterministic
dictionary: the distinct key strings of the participating datasets, sorted,
ranked — same dense-int property, rebuildable from inputs, identical on
every worker.

Numbering is stable under dataset growth only if rebuilt; pipelines that
need stable incremental ids persist the dictionary parquet and extend it
(new terms appended after the existing max — mirroring the taxonomy
writer's append-only ordinals).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class TermNumerator:
    def __init__(self, terms: list[str] | None = None):
        self.terms: list[str] = list(terms or [])
        self.index: dict[str, int] = {t: i for i, t in enumerate(self.terms)}

    @classmethod
    def from_datasets(cls, datasets_and_cols: list[tuple[object, str]]) -> "TermNumerator":
        """Build from the union of distinct values of (dataset, column) pairs
        — the ``ds.unique`` path, one small shuffle per input."""
        values: set[str] = set()
        for ds, col in datasets_and_cols:
            values.update(str(v) for v in ds.unique(col))
        return cls(sorted(values))

    def numerate(self, term: str) -> int:
        """numerateTerm analog (TermNumerator.java:51-53): append-only upsert."""
        ix = self.index.get(term)
        if ix is None:
            ix = len(self.terms)
            self.terms.append(term)
            self.index[term] = ix
        return ix

    def numerate_array(self, values: list[str]) -> np.ndarray:
        return np.fromiter(
            (self.index.get(str(v), -1) for v in values), dtype=np.int64, count=len(values)
        )

    @property
    def size(self) -> int:
        return len(self.terms)

    def save(self, path: str) -> None:
        pq.write_table(pa.table({"term": pa.array(self.terms, type=pa.string())}), path)

    @classmethod
    def load(cls, path: str) -> "TermNumerator":
        if not os.path.exists(path):
            return cls()
        return cls(pq.read_table(path)["term"].to_pylist())


def numerate_columns(ds, cols: list[str], numerator: TermNumerator, suffix: str = "_key"):
    """Broadcast the dictionary once (ray.put) and attach numerated int
    columns per batch — the KEYFIELD build path
    (DocumentStringToDocument.java:136-144) as a map_batches stage."""
    import ray

    ref = ray.put(list(numerator.terms))

    class Numerate:
        def __init__(self):
            # ordinal order: position in the value set IS the numerated id
            self.value_set = pa.array(ray.get(ref), type=pa.string())

        def _stringify(self, col):
            """Match the dictionary builders' ``str(v)`` exactly: Arrow's
            cast-to-string agrees with ``str()`` only for string and integer
            types (floats: '7' vs '7.0'; bools: 'true' vs 'True'), and the
            builders numerate nulls as the literal 'None'."""
            import pyarrow.compute as pc

            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = col.type
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                keys = col
            elif pa.types.is_integer(t):
                keys = pc.cast(col, pa.string())
            else:  # float/bool/decimal/...: rare key types, str() per value
                keys = pa.array(
                    [None if v is None else str(v) for v in col.to_pylist()],
                    type=pa.string(),
                )
            return pc.fill_null(keys, "None")

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if batch.schema.metadata:
                batch = batch.replace_schema_metadata(None)
            for c in cols:
                ids = pc.index_in(self._stringify(batch[c]), value_set=self.value_set)
                ids = pc.fill_null(pc.cast(ids, pa.int64()), -1)
                batch = batch.append_column(c + suffix, ids)
            return batch

    return ds.map_batches(Numerate, batch_format="pyarrow", concurrency=(1, 4))
