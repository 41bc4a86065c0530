"""Parquet-backed key-value store with read-your-writes overlay.

Re-expresses ``LuceneKeyValueStore``
(/root/reference/meresco/lucene/pylucene/lucenekeyvaluestore.py:44-125): a
string→string store where uncommitted writes are visible to the writer
(overlay dict) and ``commit()`` makes them durable; last write per key wins.
The Lucene index backing becomes a sorted parquet file swapped atomically.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


class KeyValueStore:
    def __init__(self, path: str):
        self.path = path
        self._base: dict[str, str] = {}
        self._overlay: dict[str, str | None] = {}  # None = deleted
        if os.path.exists(path):
            t = pq.read_table(path)
            self._base = dict(zip(t["key"].to_pylist(), t["value"].to_pylist()))

    def __setitem__(self, key: str, value: str) -> None:
        self._overlay[str(key)] = str(value)

    def __getitem__(self, key: str) -> str:
        key = str(key)
        if key in self._overlay:
            v = self._overlay[key]
            if v is None:
                raise KeyError(key)
            return v
        return self._base[key]

    def get(self, key: str, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __delitem__(self, key: str) -> None:
        if self.get(key) is None:
            raise KeyError(key)
        self._overlay[str(key)] = None

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __len__(self) -> int:
        merged = {**self._base, **self._overlay}
        return sum(1 for v in merged.values() if v is not None)

    def items(self):
        merged = {**self._base, **self._overlay}
        return sorted((k, v) for k, v in merged.items() if v is not None)

    def commit(self) -> None:
        """Durable publish (temp file + atomic rename)."""
        merged = dict(self.items())
        t = pa.table(
            {
                "key": pa.array(list(merged.keys()), type=pa.string()),
                "value": pa.array(list(merged.values()), type=pa.string()),
            }
        )
        tmp = self.path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, self.path)
        self._base = merged
        self._overlay.clear()
