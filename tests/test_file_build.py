"""Zero-shuffle file-partitioned build: determinism, equivalence with the
hash-sharded dataset build, resumability."""

import glob
import os

import numpy as np
import pytest

from meresco_lucene_ray.corpus import corpus_batch, synthesize_corpus
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import BoolQ, IndexSearcher, PhraseQ, TermQ
from meresco_lucene_ray.query.oracle import BruteForceIndex

N = 300


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    synthesize_corpus(N, seed=42, parallelism=4).write_parquet(d)
    return d


def _cfg(**kw):
    return IndexConfig(
        text_col="content",
        id_from=("repo", "path", "commit"),
        stored_cols=("lang",),
        store_positions=True,
        **kw,
    )


def test_file_build_matches_dataset_build(corpus_dir, tmp_path):
    import ray.data as rd

    f_dir, d_dir = str(tmp_path / "file"), str(tmp_path / "ds")
    m1 = build_index(corpus_dir, f_dir, _cfg(), target_docs_per_segment=80)
    m2 = build_index(rd.read_parquet(corpus_dir), d_dir, _cfg(num_shards=4))
    assert m1.num_docs == m2.num_docs == N
    assert m1.sum_dl == m2.sum_dl
    s1, s2 = IndexSearcher(f_dir, num_actors=2), IndexSearcher(d_dir, num_actors=2)
    for q in [TermQ("def"), BoolQ(must=(TermQ("def"), TermQ("import"))), PhraseQ(("def", "the"))]:
        r1, r2 = s1.execute(q, stop=15), s2.execute(q, stop=15)
        assert r1.total == r2.total
        assert sorted(zip(r1.ids(), np.round(r1.hits["score"].to_numpy(), 9))) == sorted(
            zip(r2.ids(), np.round(r2.hits["score"].to_numpy(), 9))
        )


def test_file_build_rank_identity_vs_oracle(corpus_dir, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, _cfg(), target_docs_per_segment=80)
    s = IndexSearcher(idx, num_actors=2)
    t = corpus_batch(np.arange(N))
    ids = [
        f"{r}:{p}:{c}" for r, p, c in zip(*(t[c].to_pylist() for c in ("repo", "path", "commit")))
    ]
    oracle = BruteForceIndex(ids, t["content"].to_pylist())
    res = s.execute(TermQ("lambda"), stop=10)
    got = sorted(
        zip(res.ids(), res.hits["score"].to_pylist()), key=lambda x: (-round(x[1], 9), x[0])
    )
    want = oracle.top_k_or(["lambda"], 10)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_file_build_resume(corpus_dir, tmp_path):
    idx = str(tmp_path / "idx")
    m1 = build_index(corpus_dir, idx, _cfg(), target_docs_per_segment=80)
    seg = glob.glob(os.path.join(idx, "segments", "*", "postings.parquet"))[0]
    mtime = os.path.getmtime(seg)
    m2 = build_index(corpus_dir, idx, _cfg(), target_docs_per_segment=80)
    assert os.path.getmtime(seg) == mtime  # unit skipped via lineage fingerprint
    assert m2.num_docs == m1.num_docs
