"""Property test: stored-column prefixSearch pushdown vs a per-doc model.

test_prefix_pushdown.py pins one example; hypothesis here generates random
corpora — a nullable scalar keyword column and a hierarchical path column —
plus a random deletion set and random prefixes, and asserts the pushed-down
``prefix_search`` equals an independent live-doc count model (scalar: docs
per value; paths: docs per '>'-joined rollup prefix), df-desc sorted."""

import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import delete_documents
from meresco_lucene_ray.query import IndexSearcher

_LANGS = ["en", "eo", "e", "de", "", None]
_PARTS = ["a", "ab", "b"]

_doc = st.tuples(
    st.sampled_from(_LANGS),
    st.lists(st.sampled_from(_PARTS), min_size=0, max_size=3),
)
_CORPUS = st.lists(_doc, min_size=1, max_size=16)
_PREFIX = st.sampled_from(["", "e", "en", "a", "ab", "a>", "a>a", "zz"])


def _model(docs, dead, field_idx, prefix):
    counts: dict[str, int] = {}
    for i, d in enumerate(docs):
        if i in dead:
            continue
        v = d[field_idx]
        keys = (
            [v]
            if field_idx == 0
            else [">".join(v[:k]) for k in range(1, len(v) + 1)]
        )
        for key in keys:
            if isinstance(key, str) and key.startswith(prefix):
                counts[key] = counts.get(key, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=_CORPUS,
    dead_bits=st.lists(st.booleans(), min_size=16, max_size=16),
    prefix=_PREFIX,
)
def test_random_stored_prefix_counts(ray_session, docs, dead_bits, prefix):
    import ray.data as rd

    ids = [f"d{i:03d}" for i in range(len(docs))]
    t = pa.table(
        {
            "__id__": ids,
            "text": ["filler text"] * len(docs),
            "lang": pa.array([d[0] for d in docs], type=pa.string()),
            "path": pa.array([d[1] for d in docs], type=pa.list_(pa.string())),
        }
    )
    d = f"/tmp/mlr_prefixprop/{uuid.uuid4().hex}"
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("lang", "path"), num_shards=2
    )
    try:
        build_index(rd.from_arrow(t), d, cfg)
        dead = {i for i in range(len(docs)) if dead_bits[i]}
        if dead == set(range(len(docs))):
            dead.pop()  # keep at least one live doc
        if dead:
            delete_documents(d, [ids[i] for i in sorted(dead)])
        s = IndexSearcher(d, num_actors=2)

        assert s.prefix_search(prefix, limit=1000, field="lang") == _model(
            docs, dead, 0, prefix
        )
        assert s.prefix_search(prefix, limit=1000, field="path") == _model(
            docs, dead, 1, prefix
        )
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
