"""clusterTopDocsResponse through the engine (Lucene.java:253-269,365-414):
overfetch, per-hit cluster collapse, representative + topDocs/topTerms, and
the x-clustering flag through ComposedQuery/MultiSearcher."""

from collections import Counter

import pyarrow as pa
import pytest

from meresco_lucene_ray.analysis import tokenize
from meresco_lucene_ray.cluster import ClusterConfig, ClusterStrategy
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ

TEXTS = {
    **{f"a{i}": "common aap noot noot noot vuur" for i in range(5)},
    **{f"b{i}": "common something else" for i in range(5)},
    **{f"c{i}": "common iets anders" for i in range(5)},
}


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index

    t = pa.table(
        {
            "__id__": list(TEXTS),
            "text": list(TEXTS.values()),
            "key": pa.array(range(len(TEXTS)), type=pa.int64()),
        }
    )
    d = str(tmp_path_factory.mktemp("clx") / "idx")
    build_index(
        rd.from_arrow(t), d, IndexConfig(text_col="text", id_col="__id__", num_shards=2)
    )
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    s.set_termvector_provider(
        lambda ids: [{"text": Counter(tokenize(TEXTS[i]))} for i in ids]
    )
    return s


def _config():
    return ClusterConfig(cluster_more_records=100).add_strategy(
        ClusterStrategy(0.5, 1).add_field("text", 1.0, None)
    )


def test_cluster_top_docs_collapses_duplicates(searcher):
    total, hits = searcher.cluster_top_docs(
        TermQ("common"), _config(), searcher.termvectors_fn, start=0, stop=3
    )
    assert total == 15
    assert len(hits) == 3
    groups = set()
    for h in hits:
        assert len(h.top_docs) == 5
        members = {d.doc_id for d in h.top_docs}
        assert h.id in members  # representative comes from its own cluster
        groups.add(frozenset(members))
    assert len(groups) == 3
    # each cluster is one text group
    for h in hits:
        prefixes = {m.doc_id[0] for m in h.top_docs}
        assert len(prefixes) == 1


def test_cluster_top_docs_top_terms(searcher):
    _, hits = searcher.cluster_top_docs(
        TermQ("common"), _config(), searcher.termvectors_fn, stop=3
    )
    term_lists = {tuple(t.term for t in h.top_terms) for h in hits}
    assert ("common", "noot", "aap", "vuur") in term_lists or any(
        "noot" in tl for tl in term_lists
    )


def test_unclustered_hit_passes_through(searcher):
    """A hit whose doc has no cluster (eps 0 collapses everything to noise…
    actually: single-member clusters are noise with no self-neighbor) comes
    back as a bare ClusterHit with its own id."""
    config = ClusterConfig(cluster_more_records=0).add_strategy(
        # min_points high enough that nothing is core → all noise
        ClusterStrategy(0.5, 10).add_field("text", 1.0, None)
    )
    total, hits = searcher.cluster_top_docs(
        TermQ("common"), config, searcher.termvectors_fn, stop=4
    )
    assert total == 15 and len(hits) == 4
    assert all(not h.top_docs and not h.top_terms for h in hits)


def test_clustering_flag_through_multisearcher(searcher):
    from meresco_lucene_ray.join import ComposedQuery, MultiSearcher

    ms = MultiSearcher({"core": searcher}, 16, cluster_config=_config())
    cq = ComposedQuery(result_core="core", queries={"core": TermQ("common")}, stop=3)
    cq.clustering = True
    res = ms.execute(cq)
    assert res.cluster_hits is not None and len(res.cluster_hits) == 3
    # flag off (or no config) → no cluster hits
    cq2 = ComposedQuery(result_core="core", queries={"core": TermQ("common")}, stop=3)
    assert ms.execute(cq2).cluster_hits is None
    ms_nocfg = MultiSearcher({"core": searcher}, 16)
    cq3 = ComposedQuery(result_core="core", queries={"core": MatchAllQ()}, stop=3)
    cq3.clustering = True
    assert ms_nocfg.execute(cq3).cluster_hits is None


def test_stored_termvectors_cluster_without_provider(ray_session, tmp_path):
    """store_termvectors=True (the Lucene storeTermVectors analog): the
    index serves its own term vectors; clustering needs no external
    provider, through both cluster_top_docs and the composed path."""
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index
    from meresco_lucene_ray.join import ComposedQuery, MultiSearcher

    t = pa.table(
        {
            "__id__": list(TEXTS),
            "text": list(TEXTS.values()),
        }
    )
    d = str(tmp_path / "tvidx")
    build_index(
        rd.from_arrow(t),
        d,
        IndexConfig(text_col="text", id_col="__id__", num_shards=2, store_termvectors=True),
    )
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    assert s.has_stored_termvectors()
    total, hits = s.cluster_top_docs(TermQ("common"), _config(), stop=3)
    assert total == 15 and len(hits) == 3
    assert all(len(h.top_docs) == 5 for h in hits)
    # stored vectors equal the analyzer's view of the doc's text
    res0 = s.execute(TermQ("common"), stop=15, stored_fields=())
    did0 = res0.hits["docid"][0].as_py()
    id0 = res0.hits["__id__"][0].as_py()
    (ft,) = s.termvectors_by_docid([did0]).values()
    assert ft["text"] == Counter(tokenize(TEXTS[id0]))
    ms = MultiSearcher({"core": s}, 16, cluster_config=_config())
    cq = ComposedQuery(result_core="core", queries={"core": TermQ("common")}, stop=3)
    cq.clustering = True
    res = ms.execute(cq)
    assert res.cluster_hits is not None and len(res.cluster_hits) == 3


def test_clustering_wins_over_dedup(searcher):
    """testClusteringWinsOverGroupingAndDedup: with clustering active the
    dedup collector is NOT applied (the reference routes to
    clusterTopDocsResponse instead of the dedup path)."""
    from meresco_lucene_ray.join import ComposedQuery, MultiSearcher

    ms = MultiSearcher({"core": searcher}, 16, cluster_config=_config())
    cq = ComposedQuery(result_core="core", queries={"core": TermQ("common")}, stop=3)
    cq.clustering = True
    cq.dedup_field = "key"  # every doc a distinct key — dedup would page differently
    res = ms.execute(cq)
    assert res.cluster_hits is not None and len(res.cluster_hits) == 3
    # dedup suppressed: no dedup bookkeeping on the response
    assert res.total_with_duplicates is None


def test_cluster_retry_grows_overfetch(ray_session, tmp_path_factory):
    """Lucene.java:284-320: when cluster collapse consumes more hits than
    clusterMoreRecords covered and the page is short while more matches
    exist, the collector stop grows x10 and the search re-runs.  25 of 30
    docs form ONE cluster; with clusterMoreRecords=2 and stop=5 the first
    pass sees only that cluster (1 collapsed hit) — the retry must surface
    the 5 distinct docs."""
    import ray.data as rd

    from meresco_lucene_ray.index import IndexConfig, build_index

    texts = {f"dup{i:02d}": "common aap noot mies vuur" for i in range(25)}
    for i in range(5):
        texts[f"uniq{i}"] = f"common xx{i} yy{i} zz{i} qq{i}"
    # duplicate docs carry an extra matching term so they outrank the
    # distinct docs and fill the whole first page
    texts = {k: ("common " + v if k.startswith("dup") else v) for k, v in texts.items()}
    t = pa.table({"__id__": list(texts), "text": list(texts.values())})
    d = str(tmp_path_factory.mktemp("clretry") / "idx")
    build_index(
        rd.from_arrow(t), d, IndexConfig(text_col="text", id_col="__id__", num_shards=2)
    )
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    tvfn = lambda ids: [{"text": Counter(tokenize(texts[i]))} for i in ids]  # noqa: E731

    cfg = ClusterConfig(cluster_more_records=2).add_strategy(
        ClusterStrategy(0.5, 2).add_field("text", 1.0, None)
    )
    total, hits = s.cluster_top_docs(TermQ("common"), cfg, tvfn, start=0, stop=5)
    assert total == 30
    # page filled despite the giant cluster: its representative + 4 distinct
    assert len(hits) == 5
    dup_reps = [h for h in hits if h.id.startswith("dup")]
    assert len(dup_reps) == 1 and len(dup_reps[0].top_docs) == 25
