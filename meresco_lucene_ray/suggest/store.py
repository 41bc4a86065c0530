"""Suggestion record store + incremental ngram-index refresh.

Re-expresses the two-index design of
/root/reference/src/org/meresco/lucene/suggestion/SuggestionIndex.java:
a RECORD store updated by identifier (``add``/``delete``/``commit``,
:110-126) and a DERIVED ngram index rebuilt from it on demand
(``createSuggestionNGramIndex``, :132-190) into a temp path that is
atomically swapped in — an in-flight reader keeps serving the OLD table
until it reopens.

Ray mapping: records persist as a parquet table (the analog of the
not-stored Lucene record index); the rebuild streams them through the same
``build_suggestion_index`` shingle-explode → hash-partitioned aggregate as a
bulk build.  Updates buffer in memory and merge on ``commit()`` — the
reference's MAX_COMMIT_COUNT batching (:59,:224-232) maps to committing
every N updates; at 100 TB the record store would be hash-partitioned by
identifier so a commit rewrites only touched partitions (same layout the
main index uses), which this single-file version documents rather than
needs at suggestion-store sizes (record stores are ~10^6-10^8 rows).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .autocomplete import AutocompleteReader, build_suggestion_index

_SCHEMA = pa.schema(
    [
        ("identifier", pa.string()),
        ("key", pa.int64()),
        ("type", pa.string()),
        ("creator", pa.string()),
        ("value", pa.string()),
    ]
)


class SuggestionIndexStore:
    """SuggestionIndex analog: record store + rebuildable ngram index."""

    def __init__(self, store_dir: str, commit_count: int = 10_000):
        os.makedirs(store_dir, exist_ok=True)
        self.store_dir = store_dir
        self.records_path = os.path.join(store_dir, "records.parquet")
        self.suggest_path = os.path.join(store_dir, "suggest.parquet")
        self.version_path = os.path.join(store_dir, "_VERSION")
        self._commit_count = commit_count
        # buffered updates: identifier -> list of value rows (None = delete)
        self._pending: dict[str, list[dict] | None] = {}
        self._reader: AutocompleteReader | None = None

    # ---- record store (SuggestionIndex.add/delete, :110-126) ----

    def add(self, identifier: str, key: int, values, types=None, creators=None) -> None:
        """Upsert one record: replaces any previous rows for ``identifier``
        (Lucene's updateDocument-by-Term semantics)."""
        n = len(values)
        types = list(types) if types is not None else [None] * n
        creators = list(creators) if creators is not None else [None] * n
        self._pending[identifier] = [
            {
                "identifier": identifier,
                "key": int(key),
                "type": types[i] or "",
                "creator": creators[i] or "",
                "value": values[i],
            }
            for i in range(n)
        ]
        self._maybe_commit()

    def delete(self, identifier: str) -> None:
        self._pending[identifier] = None
        self._maybe_commit()

    def _maybe_commit(self) -> None:
        if len(self._pending) >= self._commit_count:
            self.commit()

    def commit(self) -> None:
        """Merge buffered updates into the record parquet (atomic replace).
        Touched identifiers' old rows drop; new rows append."""
        if not self._pending:
            return
        import pyarrow.compute as pc

        tables = []
        if os.path.exists(self.records_path):
            old = pq.read_table(self.records_path)
            mask = pc.invert(
                pc.is_in(old["identifier"], value_set=pa.array(list(self._pending)))
            )
            tables.append(old.filter(mask))
        rows = [r for rs in self._pending.values() if rs for r in rs]
        if rows:
            tables.append(pa.Table.from_pylist(rows, schema=_SCHEMA))
        merged = (
            pa.concat_tables(tables, promote_options="default")
            if tables
            else _SCHEMA.empty_table()
        )
        tmp = self.records_path + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, self.records_path)
        self._pending.clear()
        self._bump_version("records")

    # ---- versioning ----

    def _versions(self) -> dict:
        if os.path.exists(self.version_path):
            with open(self.version_path) as f:
                return json.load(f)
        return {"records": 0, "suggest": -1}

    def _bump_version(self, which: str) -> None:
        v = self._versions()
        if which == "records":
            v["records"] = v.get("records", 0) + 1
        else:
            v["suggest"] = v["records"]
        tmp = self.version_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(v, f)
        os.replace(tmp, self.version_path)

    def ngram_index_stale(self) -> bool:
        """True when records changed since the last ngram rebuild — the
        trigger the reference's periodic background thread polls for."""
        v = self._versions()
        return bool(self._pending) or v.get("suggest", -1) != v.get("records", 0)

    def num_docs(self) -> int:
        self.commit()
        if not os.path.exists(self.records_path):
            return 0
        t = pq.read_table(self.records_path, columns=["identifier"])
        import pyarrow.compute as pc

        return len(pc.unique(t["identifier"]))

    # ---- derived ngram index (createSuggestionNGramIndex, :132-190) ----

    def create_suggestion_ngram_index(self) -> str:
        """Rebuild the suggestion ngram table from the record store and swap
        it in atomically.  A reader opened before the swap keeps serving the
        old table (it loaded it into memory); ``reader(reopen=True)`` picks
        up the new one — exactly the reference's reopen() contract."""
        import ray.data as rd

        self.commit()
        if not os.path.exists(self.records_path):
            pq.write_table(_SCHEMA.empty_table(), self.records_path)
        build_suggestion_index(
            rd.read_parquet(self.records_path),
            value_col="value",
            out_path=self.suggest_path,  # build writes tmp + os.replace itself
            key_col="key",
            type_col="type",
            creator_col="creator",
        )
        self._bump_version("suggest")
        self._reader = None
        return self.suggest_path

    def reader(self, reopen: bool = False) -> AutocompleteReader:
        if self._reader is None or reopen:
            self._reader = AutocompleteReader(self.suggest_path)
        return self._reader
