"""Property test: facet counts (Q9) on RANDOM corpora vs a brute-force model.

test_facets.py pins one 4-doc example; hypothesis here generates random
corpora — multivalued flat facets (mode='multi', FacetSuperCollector
analog) and hierarchical path facets (mode='hier', rollup per
MerescoTaxonomyFacetCounts) — over 2-shard indexes with tombstone-free
and empty-list/short-path edge docs, and asserts the merged
drilldown_data for MatchAll AND per-term queries equals an independent
per-doc count model.  Lists are duplicate-free by construction (the
reference's FacetsConfig path sets)."""

import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ

_VOCAB = ["alpha", "beta", "gamma"]
_TAGS = ["t1", "t2", "t3", "t4"]
_PATH_PARTS = ["x", "y", "z"]

_doc = st.tuples(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=4).map(" ".join),
    st.lists(st.sampled_from(_TAGS), min_size=0, max_size=4, unique=True),
    st.lists(st.sampled_from(_PATH_PARTS), min_size=0, max_size=3),
)

_CORPUS = st.lists(_doc, min_size=1, max_size=20)


def _model_counts(docs, match):
    tags: dict[str, int] = {}
    paths: dict[str, int] = {}
    for text, tag_list, path in docs:
        if not match(text):
            continue
        for t in tag_list:
            tags[t] = tags.get(t, 0) + 1
        for depth in range(1, len(path) + 1):
            key = ">".join(path[:depth])
            paths[key] = paths.get(key, 0) + 1
    return tags, paths


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_CORPUS)
def test_random_corpus_facet_counts(ray_session, docs):
    import ray.data as rd

    t = pa.table(
        {
            "__id__": [f"d{i:03d}" for i in range(len(docs))],
            "text": [d[0] for d in docs],
            "tags": pa.array([d[1] for d in docs], type=pa.list_(pa.string())),
            "path": pa.array([d[2] for d in docs], type=pa.list_(pa.string())),
        }
    )
    d = f"/tmp/mlr_facetprop/{uuid.uuid4().hex}"
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("tags", "path"), num_shards=2
    )
    build_index(rd.from_arrow(t), d, cfg)
    s = IndexSearcher(d, num_actors=2)

    queries = [(MatchAllQ(), lambda text: True)] + [
        (TermQ(w), lambda text, w=w: w in text.split()) for w in _VOCAB
    ]
    for q, match in queries:
        res = s.execute(
            q, stop=0, facets=[("tags", "multi"), ("path", "hier")]
        )
        want_tags, want_paths = _model_counts(docs, match)
        got_tags = {k: v for k, v in res.drilldown_data["tags"].items() if v}
        got_paths = {k: v for k, v in res.drilldown_data["path"].items() if v}
        assert got_tags == want_tags, (got_tags, want_tags)
        assert got_paths == want_paths, (got_paths, want_paths)
