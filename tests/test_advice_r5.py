"""Regression tests for the round-4 ADVICE findings + round-5 verdict items:

1. Empty dedup pages carry EVERY requested stored-field column with the doc
   table's dtypes, not just ``__id__`` (engine fetch returns a typed
   zero-row table when no docid lands in any segment).
2. ``_evict_one`` survives the iterator races concurrent clients can
   produce (RuntimeError/StopIteration), instead of corrupting a query.
3. ``termvector_triples`` is the vectorized term-vector surface: flat
   (docid, term, tf) rows matching the Counter adapter exactly.
4. A custom analyzer emitting the reserved U+001F field separator is
   rejected at tokenize time (multifield dictionary uniqueness guard).
"""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, TermQ


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    import ray.data as rd

    n = 24
    rows = {
        "__id__": [f"d{i:02d}" for i in range(n)],
        "text": ["alpha beta " + ("gamma " * (1 + i % 3)) for i in range(n)],
        "grp": pa.array([f"g{i % 6}" for i in range(n)]),
        "prio": pa.array([i * 7 % 11 for i in range(n)], type=pa.int64()),
        "label": pa.array([f"L{i}" for i in range(n)]),
    }
    d = str(tmp_path_factory.mktemp("r5adv") / "idx")
    cfg = IndexConfig(
        text_col="text",
        id_col="__id__",
        stored_cols=("grp", "prio", "label"),
        num_shards=3,
        store_termvectors=True,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return d


def test_empty_fetch_is_typed(small_index):
    s = IndexSearcher(small_index, num_actors=2, num_cpus=0.25)
    t = s.fetch([], ["__id__", "prio", "label"])
    assert t is not None and len(t) == 0
    assert t["__id__"].type == pa.string()
    assert t["prio"].type == pa.int64()
    assert t["label"].type == pa.string()


def test_empty_dedup_page_keeps_all_stored_columns(small_index):
    """Paging past the last group: the zero-row hits table carries every
    requested stored column (the round-4 ADVICE empty-page finding)."""
    s = IndexSearcher(small_index, num_actors=2, num_cpus=0.25)
    for gate in (500_000, 0):
        s.dedup_driver_max_rows = gate
        res = s.execute(
            TermQ("alpha"),
            start=100,
            stop=110,
            dedup_field="grp",
            stored_fields=("prio", "label"),
        )
        assert len(res.hits) == 0
        for col in ("__id__", "prio", "label", "grp", "score", "duplicateCount"):
            assert col in res.hits.column_names, (gate, res.hits.schema)
        # fetched columns keep doc-table dtypes even on the empty page
        assert res.hits["prio"].type == pa.int64()
        assert res.hits["label"].type == pa.string()


def test_nonempty_dedup_page_columns_match_empty_page(small_index):
    s = IndexSearcher(small_index, num_actors=2, num_cpus=0.25)
    full = s.execute(
        TermQ("alpha"), stop=3, dedup_field="grp", stored_fields=("prio", "label")
    )
    empty = s.execute(
        TermQ("alpha"), start=50, stop=53, dedup_field="grp", stored_fields=("prio", "label")
    )
    assert set(full.hits.column_names) == set(empty.hits.column_names)


def test_termvector_triples_matches_counter_adapter(small_index):
    s = IndexSearcher(small_index, num_actors=2, num_cpus=0.25)
    res = s.execute(TermQ("gamma"), stop=5)
    docids = res.hits["docid"].to_pylist()
    trip = s.termvector_triples(docids)
    assert set(trip.column_names) == {"docid", "term", "tf"}
    tvs = s.termvectors_by_docid(docids)
    # triples grouped per doc == Counter adapter content
    for did in docids:
        mask = pc_equal(trip, did)
        terms = trip["term"].filter(mask).to_pylist()
        tfs = trip["tf"].filter(mask).to_pylist()
        assert dict(zip(terms, tfs)) == dict(tvs[did]["text"])
    # no duplicate (docid, term) pairs — one run per term per doc
    pairs = list(zip(trip["docid"].to_pylist(), trip["term"].to_pylist()))
    assert len(pairs) == len(set(pairs))


def pc_equal(trip, did):
    import pyarrow.compute as pc

    return pc.equal(trip["docid"], did)


def test_termvector_triples_empty(small_index):
    s = IndexSearcher(small_index, num_actors=2, num_cpus=0.25)
    trip = s.termvector_triples([])
    assert len(trip) == 0 and set(trip.column_names) == {"docid", "term", "tf"}
    assert s.termvectors_by_docid([]) == {}


def test_evict_one_tolerates_races():
    from meresco_lucene_ray.query.engine import _evict_one

    d = {i: i for i in range(5)}
    _evict_one(d)
    assert len(d) == 4
    _evict_one({})  # StopIteration path: no raise

    class RacyDict(dict):
        def __iter__(self):
            raise RuntimeError("dictionary changed size during iteration")

    _evict_one(RacyDict(a=1))  # RuntimeError path: no raise


def test_field_sep_token_rejected():
    """A custom tokenizer emitting U+001F in a token breaks the multifield
    dictionary's uniqueness invariant — rejected at tokenize time (the
    extension surface is the per-field tokenizer callable)."""
    from meresco_lucene_ray.index.build import TokenizeStage

    cfg = IndexConfig(
        text_col="text",
        id_col="__id__",
        text_fields=("extra",),
        analyzer="whitespace",  # python tokenizer path (the pluggable one)
    )
    stage = TokenizeStage(cfg)
    stage._field_tokenizers["extra"] = lambda texts: [["bad\x1ftoken"] for _ in texts]
    batch = pa.table(
        {
            "__id__": pa.array(["a", "b"]),
            "text": pa.array(["one two", "three"]),
            "extra": pa.array(["x y", "z"]),
        }
    )
    with pytest.raises(ValueError, match="U\\+001F|field separator"):
        stage(batch)
    # the frozen built-in tokenizers can never emit it — same batch passes
    clean = TokenizeStage(cfg)
    assert len(clean(batch)) == 2


def test_nan_dedup_keys_from_multiple_segments(ray_session, tmp_path):
    """A NUMERIC dedup field with missing values yields NaN keys in the
    per-segment partials (segment.col() -> float64 + NaN).  With NaN rows
    from >=2 segments the Arrow merge must not desynchronize its column
    zip (numpy run-split counts each NaN as its own run; group_by
    collapses them) - NaN keys never form a group, as the former pandas
    merge behaved."""
    import ray.data as rd

    n = 40
    rows = {
        "__id__": [f"d{i:02d}" for i in range(n)],
        "text": ["hit " * (1 + i % 3) for i in range(n)],
        # every 5th doc lacks the dedup key; present keys form 3 groups
        "grpn": pa.array(
            [None if i % 5 == 0 else (i % 3) for i in range(n)], type=pa.int64()
        ),
    }
    d = str(tmp_path / "nankeys")
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("grpn",), num_shards=4
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    for gate, mode in [(500_000, "driver"), (0, "distributed")]:
        s.dedup_driver_max_rows = gate
        res = s.execute(TermQ("hit"), stop=10, dedup_field="grpn")
        assert s.last_dedup_path == mode
        assert res.total == 3, mode  # NaN-key docs never form a group
        # totalWithDuplicates still counts every matching doc (the cnt sum
        # runs upstream of the key filter on both paths)
        assert res.total_with_duplicates == n, mode
        keys = res.hits["grpn"].to_pylist()
        assert sorted(int(k) for k in keys) == [0, 1, 2], mode
        # fieldsort mode agrees too
        res2 = s.execute(
            TermQ("hit"),
            stop=10,
            dedup_field="grpn",
            sort=[("grpn", False, None)],
            stored_fields=("grpn",),
        )
        assert res2.total == 3 and len(res2.hits) == 3, mode
