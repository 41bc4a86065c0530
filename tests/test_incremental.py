"""Incremental adds (upsert), deletes (tombstones), NRT refresh, merge
expunge, geo query, TermFrequencySimilarity, KV store, analyzer options."""

import pyarrow as pa
import pytest

from meresco_lucene_ray.analysis import dutch_stem, make_tokenizer, tokenize_whitespace
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import add_documents, delete_documents
from meresco_lucene_ray.index.merge import merge_index
from meresco_lucene_ray.query import (
    GeoDistanceQ,
    IndexSearcher,
    MatchAllQ,
    TermFrequencySimilarity,
    TermQ,
)
from meresco_lucene_ray.state.kvstore import KeyValueStore


def _tbl(rows):
    return pa.table(
        {
            "__id__": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "tag": [r[2] for r in rows],
        }
    )


@pytest.fixture()
def base_index(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "idx")
    rows = [("id1", "alpha beta", "a"), ("id2", "beta gamma", "b"), ("id3", "gamma delta", "c")]
    cfg = IndexConfig(text_col="text", id_col="__id__", stored_cols=("tag",), num_shards=2)
    build_index(rd.from_arrow(_tbl(rows)), d, cfg)
    return d, cfg


def test_add_upsert_and_refresh(base_index, ray_session):
    import ray.data as rd

    d, cfg = base_index
    s = IndexSearcher(d, num_actors=1)
    assert s.count(TermQ("beta")) == 2
    # upsert id2 (now without 'beta') + brand-new id4
    add_documents(
        rd.from_arrow(_tbl([("id2", "epsilon zeta", "b2"), ("id4", "beta eta", "d")])), d, cfg
    )
    # stale searcher still sees the old state until refresh (NRT semantics)
    assert s.manifest.version == 1
    assert s.refresh() is True
    assert s.refresh() is False  # idempotent
    assert s.count(TermQ("beta")) == 2  # id1 + id4 (old id2 tombstoned)
    res = s.execute(TermQ("epsilon"))
    assert res.ids() == ["id2"]
    fetched = dict(zip(res.hits["__id__"].to_pylist(), res.hits["score"].to_pylist()))
    assert "id2" in fetched
    assert s.count(MatchAllQ()) == 4  # id1, id3, new id2, id4


def test_delete_documents(base_index, ray_session):
    d, cfg = base_index
    s = IndexSearcher(d, num_actors=1)
    delete_documents(d, ["id1"])
    s.refresh()
    assert s.count(MatchAllQ()) == 2
    assert s.count(TermQ("alpha")) == 0


def test_merge_expunges_tombstones(base_index, ray_session, tmp_path):
    import ray.data as rd

    d, cfg = base_index
    add_documents(rd.from_arrow(_tbl([("id2", "epsilon zeta", "b2")])), d, cfg)
    delete_documents(d, ["id3"])
    out = str(tmp_path / "merged")
    m = merge_index(d, out, max_merge_at_once=10, num_actors=1)
    assert m.num_docs == 2  # id1 + new id2 (old id2 and id3 expunged)
    s = IndexSearcher(out, num_actors=1)
    assert s.count(MatchAllQ()) == 2
    assert sorted(s.execute(MatchAllQ()).ids()) == ["id1", "id2"]
    assert s.count(TermQ("gamma")) == 0  # old id2/id3 text gone
    assert s.count(TermQ("epsilon")) == 1


def test_geo_distance(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "__id__": ["ams", "utrecht", "paris"],
            "text": ["city a", "city b", "city c"],
            "lat": [52.37, 52.09, 48.86],
            "lon": [4.90, 5.12, 2.35],
        }
    )
    d = str(tmp_path / "geo")
    cfg = IndexConfig(text_col="text", id_col="__id__", stored_cols=("lat", "lon"), num_shards=1)
    build_index(rd.from_arrow(t), d, cfg)
    s = IndexSearcher(d, num_actors=1)
    # 50 km around Amsterdam: Utrecht (~35 km) in, Paris (~430 km) out
    q = GeoDistanceQ("lat", "lon", 52.37, 4.90, 50_000)
    assert sorted(s.execute(q).ids()) == ["ams", "utrecht"]


def test_term_frequency_similarity(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"__id__": ["x", "y"], "text": ["w w w", "w"]})
    d = str(tmp_path / "tfs")
    build_index(rd.from_arrow(t), d, IndexConfig(text_col="text", id_col="__id__", num_shards=1))
    s = IndexSearcher(d, num_actors=1, similarity=TermFrequencySimilarity())
    res = s.execute(TermQ("w", boost=2.0))
    scores = dict(zip(res.ids(), res.hits["score"].to_pylist()))
    # score = tf/1000 * boost (TermFrequencySimilarity.java:40-59)
    assert scores["x"] == pytest.approx(3 / 1000 * 2.0, rel=1e-6)
    assert scores["y"] == pytest.approx(1 / 1000 * 2.0, rel=1e-6)


def test_engine_spell_and_fieldnames(base_index):
    d, cfg = base_index
    s = IndexSearcher(d, num_actors=1)
    got = s.spell_suggest("betaa")
    assert got and got[0][0] == "beta"
    assert s.spell_suggest("beta") == []  # NOT_IN_INDEX
    assert s.fieldnames() == ["tag", "text"]


def test_kvstore(tmp_path):
    path = str(tmp_path / "kv.parquet")
    kv = KeyValueStore(path)
    kv["a"] = "1"
    assert kv["a"] == "1"  # read-your-writes before commit
    assert "a" in kv and len(kv) == 1
    kv.commit()
    kv2 = KeyValueStore(path)
    assert kv2["a"] == "1"
    kv2["a"] = "2"  # last write wins
    del kv2["a"]
    with pytest.raises(KeyError):
        kv2["a"]
    kv2.commit()
    assert len(KeyValueStore(path)) == 0


def test_analyzer_options():
    # whitespace: no lowercasing, split on whitespace only
    assert tokenize_whitespace("Foo Bar-Baz") == ["Foo", "Bar-Baz"]
    # dutch stemming mechanism: emit original + stemmed, deduped
    tok = make_tokenizer("standard", stem="dutch")
    assert tok(["boeken lopen"]) == [["boeken", "boek", "lopen", "lop"]]
    assert dutch_stem("boeken") == "boek"
    # ascii folding option
    tok2 = make_tokenizer("standard", ascii_folding=True)
    assert tok2(["café"]) == [["cafe"]]


def test_collector_cache(base_index):
    d, cfg = base_index
    s = IndexSearcher(d, num_actors=1)
    # need an int key col: use dl? use tag→not int. Build bitset on a numeric col:
    # reuse the index's own docvalues via a query on text instead
    bs1 = s.collect_keys(TermQ("beta"), "dl", size=16)
    assert ("keys", repr(TermQ("beta")), "dl", 16, s.manifest.version) in s._cache
    bs2 = s.collect_keys(TermQ("beta"), "dl", size=16)
    assert (bs1 == bs2).all()


def test_stemmed_index_build(ray_session, tmp_path):
    """M2 through the FULL build: stemmed+original tokens both indexed."""
    import ray.data as rd

    t = pa.table({"__id__": ["d1", "d2"], "text": ["boeken lezen", "other words"]})
    d = str(tmp_path / "stem")
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=1, stem="dutch")
    build_index(rd.from_arrow(t), d, cfg)
    s = IndexSearcher(d, num_actors=1)
    assert s.count(TermQ("boeken")) == 1  # original kept
    assert s.count(TermQ("boek")) == 1    # stemmed emitted
    assert s.count(TermQ("lezen")) == 1


def test_whitespace_analyzer_index_build(ray_session, tmp_path):
    """M3 through the FULL build: whitespace analyzer keeps case/punctuation."""
    import ray.data as rd

    t = pa.table({"__id__": ["d1"], "text": ["Foo-Bar baz"]})
    d = str(tmp_path / "ws")
    build_index(
        rd.from_arrow(t),
        d,
        IndexConfig(text_col="text", id_col="__id__", num_shards=1, analyzer="whitespace"),
    )
    s = IndexSearcher(d, num_actors=1)
    assert s.count(TermQ("Foo-Bar")) == 1  # not lowercased, not split on '-'
    assert s.count(TermQ("foo")) == 0


def test_delete_by_query(base_index, ray_session):
    from meresco_lucene_ray.index.build import delete_by_query

    d, cfg = base_index
    s = IndexSearcher(d, num_actors=1)
    # 'gamma' matches id2 + id3; id1 survives
    delete_by_query(d, TermQ("gamma"), searcher=s)
    s.refresh()
    assert s.count(MatchAllQ()) == 1
    assert s.execute(TermQ("alpha")).ids() == ["id1"]
    # no-match query is a no-op publish
    m = delete_by_query(d, TermQ("nosuchterm"))
    assert m.num_docs >= 0
    s.refresh()
    assert s.count(MatchAllQ()) == 1
