"""Segment merge: query results over the merged index must equal the
original (docids remapped, scores & totals identical)."""

import numpy as np
import pytest

from meresco_lucene_ray.corpus import synthesize_corpus
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.merge import merge_index
from meresco_lucene_ray.query import BoolQ, IndexSearcher, PhraseQ, TermQ


@pytest.fixture(scope="module")
def merged(ray_session, tmp_path_factory):
    src_dir = str(tmp_path_factory.mktemp("src_idx"))
    out_dir = str(tmp_path_factory.mktemp("merged_idx"))
    ds = synthesize_corpus(300, seed=42, parallelism=4)
    cfg = IndexConfig(
        text_col="content",
        id_from=("repo", "path", "commit"),
        stored_cols=("lang",),
        num_shards=8,
        store_positions=True,
    )
    m1 = build_index(ds, src_dir, cfg)
    m2 = merge_index(src_dir, out_dir, max_merge_at_once=4, num_actors=2)
    return src_dir, out_dir, m1, m2


def test_merge_counts(merged):
    src_dir, out_dir, m1, m2 = merged
    assert m2.num_docs == m1.num_docs
    assert m2.sum_dl == m1.sum_dl
    assert len(m2.segments) == 2  # 8 segments / 4 per merge
    assert m2.version == m1.version + 1


@pytest.mark.parametrize(
    "q",
    [
        TermQ("def"),
        BoolQ(must=(TermQ("def"), TermQ("import"))),
        BoolQ(should=(TermQ("lambda"), TermQ("v55"))),
        PhraseQ(("def", "the")),
    ],
)
def test_merge_preserves_results(merged, q):
    src_dir, out_dir, _, _ = merged
    s1 = IndexSearcher(src_dir, num_actors=2)
    s2 = IndexSearcher(out_dir, num_actors=2)
    r1 = s1.execute(q, stop=20)
    r2 = s2.execute(q, stop=20)
    assert r1.total == r2.total
    ids1 = sorted(zip(r1.hits["__id__"].to_pylist(), np.round(r1.hits["score"].to_numpy(), 9)))
    ids2 = sorted(zip(r2.hits["__id__"].to_pylist(), np.round(r2.hits["score"].to_numpy(), 9)))
    assert ids1 == ids2


def test_merge_prefix_and_dedup(merged):
    src_dir, out_dir, _, _ = merged
    s1 = IndexSearcher(src_dir, num_actors=2)
    s2 = IndexSearcher(out_dir, num_actors=2)
    assert s1.prefix_search("v1", 10) == s2.prefix_search("v1", 10)
    d1 = s1.execute(TermQ("def"), dedup_field="lang", stop=10)
    d2 = s2.execute(TermQ("def"), dedup_field="lang", stop=10)
    assert d1.total == d2.total
    assert d1.total_with_duplicates == d2.total_with_duplicates


def test_merge_zero_postings_with_positions(ray_session, tmp_path):
    """Merge-time twin of the empty-shard positions guard in build.py: a
    merge group whose docs ALL tokenize to zero tokens (or are all
    tombstoned) produces zero postings — the positions gather must emit an
    empty out_starts, not [0], or np.repeat raises a broadcast error."""
    import pyarrow as pa
    import ray.data as rd

    from meresco_lucene_ray.index.build import delete_documents
    from meresco_lucene_ray.query import MatchAllQ

    # all-empty docs, positions on
    d1 = str(tmp_path / "empty_src")
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=2, store_positions=True)
    build_index(
        rd.from_arrow(pa.table({"__id__": ["a", "b", "c"], "text": ["", "", ""]})), d1, cfg
    )
    m = merge_index(d1, str(tmp_path / "empty_merged"), max_merge_at_once=4, num_actors=1)
    assert m.num_docs == 3
    s = IndexSearcher(str(tmp_path / "empty_merged"), num_actors=1, num_cpus=0.25)
    assert s.count(MatchAllQ()) == 3
    assert s.count(TermQ("anything")) == 0
    s.close()

    # everything tombstoned: postings rows exist but every doc is deleted
    d2 = str(tmp_path / "tomb_src")
    build_index(
        rd.from_arrow(pa.table({"__id__": ["x", "y"], "text": ["alpha beta", "alpha"]})), d2, cfg
    )
    delete_documents(d2, ["x", "y"])
    m2 = merge_index(d2, str(tmp_path / "tomb_merged"), max_merge_at_once=4, num_actors=1)
    assert m2.num_docs == 0
    s2 = IndexSearcher(str(tmp_path / "tomb_merged"), num_actors=1, num_cpus=0.25)
    assert s2.count(MatchAllQ()) == 0
    assert s2.count(TermQ("alpha")) == 0
    s2.close()
