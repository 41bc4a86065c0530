"""SuggestionIndexStore — the record-store + incremental ngram-refresh
semantics of SuggestionIndex.java:110-190 (add/delete/commit, rebuild into a
temp path, atomic swap, reader reopen)."""

import pytest

from meresco_lucene_ray.suggest import SuggestionIndexStore


@pytest.fixture()
def store(ray_session, tmp_path):
    return SuggestionIndexStore(str(tmp_path / "sugg"), commit_count=1000)


def test_add_build_suggest(store):
    store.add("rec1", 1, ["harry potter"], types=["book"], creators=["rowling"])
    store.add("rec2", 2, ["harry and the gang"])
    store.create_suggestion_ngram_index()
    got = [s for s, _ in store.reader().suggest("har")]
    assert "harry" in got
    assert any(s.startswith("harry potter") for s in got)
    assert store.num_docs() == 2


def test_upsert_replaces_previous_values(store):
    store.add("rec1", 1, ["apple pie"])
    store.create_suggestion_ngram_index()
    assert [s for s, _ in store.reader().suggest("app")]
    # update the SAME identifier: old values must disappear
    store.add("rec1", 1, ["banana bread"])
    store.create_suggestion_ngram_index()
    r = store.reader(reopen=True)
    assert not r.suggest("app")
    assert [s for s, _ in r.suggest("ban")]
    assert store.num_docs() == 1


def test_delete(store):
    store.add("rec1", 1, ["apple pie"])
    store.add("rec2", 2, ["apricot jam"])
    store.create_suggestion_ngram_index()
    store.delete("rec1")
    assert store.ngram_index_stale()
    store.create_suggestion_ngram_index()
    got = [s for s, _ in store.reader().suggest("ap")]
    assert "apricot" in got and "apple" not in got
    assert store.num_docs() == 1


def test_incremental_refresh_old_reader_serves_during_build(store):
    store.add("rec1", 1, ["gamma ray"])
    store.create_suggestion_ngram_index()
    old_reader = store.reader()
    assert not store.ngram_index_stale()

    store.add("rec2", 2, ["gamma burst"])
    store.commit()
    assert store.ngram_index_stale()
    # old reader still answers from the OLD table (loaded in memory — the
    # atomic swap can't affect it), exactly the reference's reopen contract
    assert set(s for s, _ in old_reader.suggest("gam")) == {"gamma", "gamma ray"}

    store.create_suggestion_ngram_index()
    assert not store.ngram_index_stale()
    new = [s for s, _ in store.reader(reopen=True).suggest("gam")]
    assert set(new) >= {"gamma ray", "gamma burst"}
    # pre-swap reader object is untouched
    assert set(s for s, _ in old_reader.suggest("gam")) == {"gamma", "gamma ray"}


def test_filters_survive_store_roundtrip(store):
    store.add("rec1", 1, ["searching storm"], types=["book"], creators=["alice"])
    store.add("rec2", 2, ["searching sea"], types=["film"], creators=["bob"])
    store.create_suggestion_ngram_index()
    r = store.reader()
    got = [s for s, _ in r.suggest("sea", filters=["type=film"])]
    assert got and all("sea" in s for s in got)
    assert not [s for s, _ in r.suggest("storm", filters=["type=film"])]
    # key-set filter
    assert [s for s, _ in r.suggest("sea", filter_keys={2})]
    assert not [s for s, _ in r.suggest("storm", filter_keys={2})]
