"""Block-max pruned disjunctive top-k (MaxScore/BMW family) must be
bit-identical to the dense path: same docids, same float32-quantized scores,
same exact totals — on corpora where pruning engages AND where the flatness
gate bails, with boosts, absent terms, and tombstoned docs."""

import numpy as np
import pyarrow as pa
import pytest

import meresco_lucene_ray.query.segment as seg
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import delete_documents
from meresco_lucene_ray.query import BoolQ, IndexSearcher, TermQ


@pytest.fixture(scope="module")
def clustered_index(ray_session, tmp_path_factory):
    """Docid-clustered impact: first 10% short high-impact docs, rest long
    diluted — the layout where block bounds discriminate (ingestion sorted
    by source).  Padded ids keep lexicographic order == construction order."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 6000
    docs = []
    for i in range(n):
        short = i < n // 10
        L = int(rng.integers(8, 25)) if short else int(rng.integers(120, 400))
        toks = ["hot"] * (3 if short else max(1, L // 80)) + [
            f"w{rng.integers(0, 3000)}" for _ in range(L)
        ]
        docs.append(" ".join(toks))
    t = pa.table({"__id__": [f"d{i:05d}" for i in range(n)], "text": docs})
    d = str(tmp_path_factory.mktemp("wand") / "idx")
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=2, store_positions=False)
    build_index(rd.from_arrow(t), d, cfg)
    return d


QUERIES = [
    TermQ("hot"),
    BoolQ(should=(TermQ("hot"), TermQ("w5"), TermQ("w17"))),
    BoolQ(should=(TermQ("hot", boost=2.5), TermQ("w5", boost=0.25))),
    BoolQ(should=(TermQ("zz_absent"), TermQ("hot"))),
    BoolQ(should=(TermQ("w1"), TermQ("w2"), TermQ("w3"), TermQ("w4"))),
]


def _compare(d, queries, stop=13):
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    pruned = [s.execute(q, stop=stop) for q in queries]
    orig = seg.SegmentSearcher._wand_eligible
    seg.SegmentSearcher._wand_eligible = lambda self, *a: None
    try:
        s2 = IndexSearcher(d, num_actors=2, num_cpus=0.25)
        dense = [s2.execute(q, stop=stop) for q in queries]
    finally:
        seg.SegmentSearcher._wand_eligible = orig
    for qi, (rp, rd_) in enumerate(zip(pruned, dense)):
        assert rp.total == rd_.total, qi
        assert rp.hits["__id__"].to_pylist() == rd_.hits["__id__"].to_pylist(), qi
        assert rp.hits["score"].to_pylist() == rd_.hits["score"].to_pylist(), qi


def test_pruned_matches_dense(clustered_index):
    _compare(clustered_index, QUERIES)


def test_pruned_matches_dense_large_k(clustered_index):
    _compare(clustered_index, QUERIES[:2], stop=500)


def test_pruned_matches_dense_after_deletes(clustered_index):
    # tombstone a slice of the high-impact docs; totals and pages must agree
    delete_documents(clustered_index, [f"d{i:05d}" for i in range(0, 200, 3)])
    _compare(clustered_index, QUERIES)


def test_blk_maxtfdl_written(clustered_index):
    import os

    import pyarrow.parquet as pq

    post = pq.read_table(
        os.path.join(clustered_index, "segments", "seg=00000", "postings.parquet")
    )
    assert "blk_maxtfdl" in post.column_names
    ss = seg.SegmentSearcher(os.path.join(clustered_index, "segments", "seg=00000"))
    assert ss._blk_maxtfdl is not None
