"""Multi-strategy clustering parity — mirrors
/root/reference/test/org/meresco/lucene/MerescoClustererTest.java
(testClusterOnTermVectors, testClusteringWithFieldFilter,
testClusteringOnVectorsMultipleStrategies) plus the exact
InterpolateEpsilon.java formula."""

from collections import Counter

from meresco_lucene_ray.analysis import tokenize
from meresco_lucene_ray.cluster import (
    ClusterConfig,
    ClusterStrategy,
    MerescoClusterer,
    interpolate_epsilon,
)


def _fixture_docs():
    """MerescoClustererTest.setUp: 15 docs in three groups of five."""
    texts = (
        ["aap noot noot noot vuur"] * 5
        + ["something else"] * 5
        + ["iets anders"] * 5
    )
    return [{"termvector.field": Counter(tokenize(t))} for t in texts]


def test_cluster_on_term_vectors():
    config = ClusterConfig().add_strategy(
        ClusterStrategy(0.5, 1).add_field("termvector.field", 1.0, None)
    )
    c = MerescoClusterer(config)
    for i, ft in enumerate(_fixture_docs()):
        c.collect(i, ft)
    c.finish()

    assert len(c.clusters) == 3
    cluster_terms = set()
    last_top_docs = None
    for members in c.clusters:
        doc_id = members[0][0]
        cluster = c.cluster(doc_id)
        assert len(cluster.top_docs) == 5
        assert cluster.top_docs is not last_top_docs
        last_top_docs = cluster.top_docs
        cluster_terms.add(tuple(t.term for t in cluster.top_terms))
    # exact PR order per cluster (noot tf=3 outranks aap/vuur; ties keep
    # term-ord insertion order, mirroring the Java stable sort)
    assert cluster_terms == {
        ("else", "something"),
        ("noot", "aap", "vuur"),
        ("anders", "iets"),
    }


def test_clustering_with_field_filter():
    config = ClusterConfig().add_strategy(
        ClusterStrategy(0.5, 1).add_field("termvector.field", 1.0, "noot")
    )
    c = MerescoClusterer(config)
    for i, ft in enumerate(_fixture_docs()):
        c.collect(i, ft)
    c.finish()

    assert len(c.clusters) == 1
    doc_id = c.clusters[0][0][0]
    cluster = c.cluster(doc_id)
    assert len(cluster.top_docs) == 5
    assert [t.term for t in cluster.top_terms] == ["noot", "aap", "vuur"]


def test_clustering_multiple_strategies():
    config = ClusterConfig(cluster_more_records=42)
    config.add_strategy(ClusterStrategy(0.5, 2).add_field("termvector.field", 1.0, "vuur"))
    config.add_strategy(ClusterStrategy(0.4, 1).add_field("termvector.field", 1.0, None))
    config.add_strategy(ClusterStrategy(0.4, 2).add_field("termvector.field", 1.0, "anders"))

    c = MerescoClusterer(config)
    # most-filters-first: the two filtered strategies precede the unfiltered
    assert [sc.num_filters for sc in c.strategy_clusterers] == [1, 1, 0]
    for i, ft in enumerate(_fixture_docs()):
        c.collect(i, ft)
    c.finish()

    assert len(c.clusters) == 3
    for i in range(15):
        cluster = c.cluster(i)
        ids = {d.doc_id for d in cluster.top_docs}
        assert i in ids
        if i <= 4:
            assert ids == {0, 1, 2, 3, 4}
        elif i <= 9:
            assert ids == {5, 6, 7, 8, 9}
        else:
            assert ids == {10, 11, 12, 13, 14}


def test_weight_zero_field_dropped():
    s = ClusterStrategy(0.5, 1).add_field("f", 0.0).add_field("g", 2.0)
    assert [f.fieldname for f in s.fields] == ["g"]


def test_field_weights_combine():
    """createVector: Σ weightᵢ·tfᵢ across fields (combineToSelf algebra)."""
    config = ClusterConfig().add_strategy(
        ClusterStrategy(0.5, 0).add_field("a", 2.0).add_field("b", 3.0)
    )
    c = MerescoClusterer(config)
    c.collect(0, {"a": Counter({"x": 1, "y": 2}), "b": Counter({"y": 1})})
    (doc_id, vec), = c.strategy_clusterers[0].docvectors
    assert doc_id == 0
    ox, oy = c._ords["x"], c._ords["y"]
    assert vec[ox] == 2.0 and vec[oy] == 2 * 2.0 + 1 * 3.0


def test_doc_without_filtered_field_falls_through():
    """A doc whose FIELD IS ABSENT fails a filtered strategy (termVector
    returns matched=False) and falls to the next strategy."""
    config = ClusterConfig()
    config.add_strategy(ClusterStrategy(0.5, 0).add_field("special", 1.0, "tag"))
    config.add_strategy(ClusterStrategy(0.5, 0).add_field("text", 1.0, None))
    c = MerescoClusterer(config)
    c.collect(0, {"text": Counter({"plain": 1})})
    c.collect(1, {"special": Counter({"tag": 1}), "text": Counter({"other": 1})})
    assert [d for d, _ in c.strategy_clusterers[0].docvectors] == [1]
    assert [d for d, _ in c.strategy_clusterers[1].docvectors] == [0]


def test_interpolate_epsilon_exact():
    """InterpolateEpsilon.java:31-34."""
    assert interpolate_epsilon(100, 10, 0.4, 42) == 0.4  # clamped high
    assert interpolate_epsilon(10, 10, 0.4, 42) == 0.0
    assert interpolate_epsilon(5, 10, 0.4, 42) == 0.0  # clamped low
    assert abs(interpolate_epsilon(31, 10, 0.4, 42) - 0.4 * 21 / 42) < 1e-12


def test_config_from_dict():
    """parseFromJsonObject shapes."""
    assert ClusterConfig.from_dict({}) is None
    cfg = ClusterConfig.from_dict(
        {
            "clusterMoreRecords": 7,
            "strategies": [
                {
                    "clusteringEps": 0.3,
                    "clusteringMinPoints": 2,
                    "fields": {
                        "f1": {"fieldname": "dc:title", "weight": 1.5, "filterValue": "x"},
                        "f2": {"fieldname": "dc:creator", "weight": 0.0},
                    },
                }
            ],
        }
    )
    assert cfg.cluster_more_records == 7
    (s,) = cfg.strategies
    assert s.clustering_eps == 0.3 and s.clustering_min_points == 2
    # weight-0 field dropped at parse
    assert [(f.fieldname, f.filter_value) for f in s.fields] == [("dc:title", "x")]


def test_generalized_jaccard_reference_values():
    """GeneralizedJaccardDistanceTest.test — sparse-dict form of the same
    pinned values (absent ords == zeros)."""
    from meresco_lucene_ray.cluster import distance_matrix_sparse

    def J(a, b):
        return distance_matrix_sparse([a, b])[0, 1]

    assert J({0: 1.0}, {0: 1.0}) == 0.0
    assert J({}, {0: 1.0}) == 1.0
    assert J({0: 1.0}, {}) == 1.0
    assert J({0: 1.0, 1: 2.0}, {0: 1.0, 1: 2.0}) == 0.0
    assert J({0: 1.0}, {0: 2.0}) == 0.5
    assert J({0: 2.0}, {0: 8.0}) == 0.75
    assert J({0: 8.0}, {0: 2.0}) == 0.75
    assert J({0: 1.0, 1: 2.0}, {0: 3.0, 1: 3.0}) == 0.5
    # testNaN: 0/0 distance defined as 1.0 here (the reference leaves NaN
    # and commons-math then treats the pair as not-neighbors — same effect)
    assert J({}, {}) == 1.0


def test_interpolate_epsilon_reference_table():
    """EpsilonInterpolatorTest.testInterpolateEps (eps 0.4, more=100 — the
    LuceneSettings defaults)."""
    cases = [
        (0, 10, 0.0), (10, 10, 0.0), (11, 10, 0.004), (110, 10, 0.4),
        (111, 10, 0.4), (0, 20, 0.0), (20, 20, 0.0), (21, 20, 0.004),
        (100, 20, 0.32), (120, 20, 0.4), (121, 20, 0.4),
    ]
    for hits, sl, want in cases:
        got = interpolate_epsilon(hits, sl, 0.4, 100)
        assert abs(got - want) < 1e-12, (hits, sl, got, want)


def test_cluster_config_parse_reference_shape():
    """ClusterConfigTest.testClusterConfigParseFromJsonObject."""
    cfg = ClusterConfig.from_dict(
        {
            "clusterMoreRecords": 200,
            "strategies": [
                {
                    "clusteringEps": 0.3,
                    "clusteringMinPoints": 3,
                    "fields": {
                        "dcterms:title": {"fieldname": "dcterms:title", "weight": 0.3},
                        "dcterms:creator": {
                            "fieldname": "dcterms:creator",
                            "filterValue": "b",
                            "weight": 0.7,
                        },
                    },
                },
                {
                    "clusteringEps": 0.4,
                    "clusteringMinPoints": 2,
                    "fields": {
                        "dcterms:title": {
                            "fieldname": "dcterms:title",
                            "filterValue": "a",
                            "weight": 0.4,
                        },
                        "dcterms:creator": {"fieldname": "dcterms:creator", "weight": 0.6},
                        "dcterms:subject": {"fieldname": "dcterms:subject", "weight": 0.0},
                    },
                },
            ],
        }
    )
    assert cfg.cluster_more_records == 200
    s0, s1 = cfg.strategies
    assert (s0.clustering_eps, s0.clustering_min_points) == (0.3, 3)
    assert [(f.fieldname, f.filter_value, f.weight) for f in s0.fields] == [
        ("dcterms:title", None, 0.3),
        ("dcterms:creator", "b", 0.7),
    ]
    assert (s1.clustering_eps, s1.clustering_min_points) == (0.4, 2)
    # weight-0.0 field skipped
    assert [f.fieldname for f in s1.fields] == ["dcterms:title", "dcterms:creator"]
