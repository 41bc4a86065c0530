import numpy as np

from meresco_lucene_ray.corpus import corpus_batch


def test_corpus_deterministic_and_batch_independent():
    a = corpus_batch(np.arange(0, 50))
    b1 = corpus_batch(np.arange(0, 25))
    b2 = corpus_batch(np.arange(25, 50))
    import pyarrow as pa

    assert pa.concat_tables([b1, b2]).equals(a)
    # same call twice → identical
    assert corpus_batch(np.arange(0, 50)).equals(a)


def test_corpus_schema_and_content():
    t = corpus_batch(np.arange(0, 20))
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    commits = t["commit"].to_pylist()
    assert all(len(c) == 40 for c in commits)
    ids = [f"{r}:{p}@{c}" for r, p, c in zip(*(t[c].to_pylist() for c in ("repo", "path", "commit")))]
    assert len(set(ids)) == 20
    # hot keywords present (zipf skew)
    joined = " ".join(t["content"].to_pylist())
    assert "def" in joined.split()
