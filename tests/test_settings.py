"""Mirrors /root/reference/test/lucenesettingstest.py and
/root/reference/test/org/meresco/lucene/LuceneSettingsTest.java — the
settings object, its wire dict, and the server-side parse."""

import pytest

from meresco_lucene_ray.fieldregistry import FieldRegistry
from meresco_lucene_ray.query.scorer import BM25, TermFrequencySimilarity
from meresco_lucene_ray.settings import LuceneSettings

DEFAULTS = dict(
    lruTaxonomyWriterCacheSize=4000,
    mergePolicy=dict(type="TieredMergePolicy", segmentsPerTier=8.0, maxMergeAtOnce=2),
    similarity={"type": "BM25Similarity"},
    numberOfConcurrentTasks=6,
    analyzer={"type": "MerescoStandardAnalyzer"},
    drilldownFields=[],
    commitCount=100000,
    commitTimeout=10,
    cacheFacetOrdinals=True,
    verbose=True,
)


def test_clone():  # testOne
    settings = LuceneSettings()
    assert settings.verbose
    new_settings = settings.clone(verbose=False)
    assert settings.verbose
    assert not new_settings.verbose


def test_as_post_dict():  # testAsPostDict
    assert LuceneSettings().as_post_dict() == DEFAULTS


def test_post_dict_with_drilldown_fields():  # testPostDictWithDrilldownFields
    registry = FieldRegistry()
    registry.register_drilldown_field("field0", hierarchical=True, multi_valued=False)
    registry.register_drilldown_field(
        "field1", hierarchical=True, multi_valued=True, index_field_name="$facets_2"
    )
    settings = LuceneSettings(field_registry=registry)
    want = dict(DEFAULTS)
    want["drilldownFields"] = [
        {"dim": "field0", "hierarchical": True, "fieldname": None, "multiValued": False},
        {"dim": "field1", "hierarchical": True, "fieldname": "$facets_2", "multiValued": True},
    ]
    assert settings.as_post_dict() == want


def test_configure_ordinals_cache():  # testConfigureOrdinalsCache
    settings = LuceneSettings(cache_facet_ordinals=False)
    want = dict(DEFAULTS, cacheFacetOrdinals=False)
    assert settings.as_post_dict() == want


def test_configure_merge_policy():  # testConfigureMergePolicy (both suites)
    settings = LuceneSettings(
        merge_policy={"type": "LogDocMergePolicy", "mergeFactor": 2, "maxMergeDocs": 100}
    )
    want = dict(
        DEFAULTS,
        mergePolicy=dict(type="LogDocMergePolicy", mergeFactor=2, maxMergeDocs=100),
    )
    assert settings.as_post_dict() == want

    s2 = LuceneSettings()
    s2.update_settings(
        '{"mergePolicy": {"type": "LogDocMergePolicy", "maxMergeDocs": 1000, "mergeFactor": 2}}'
    )
    assert s2.as_post_dict()["mergePolicy"] == {
        "type": "LogDocMergePolicy", "maxMergeDocs": 1000, "mergeFactor": 2,
    }
    s2.update_settings(
        '{"mergePolicy": {"type": "TieredMergePolicy", "maxMergeAtOnce": 876, "segmentsPerTier": 3.0}}'
    )
    assert s2.as_post_dict()["mergePolicy"] == {
        "type": "TieredMergePolicy", "maxMergeAtOnce": 876, "segmentsPerTier": 3.0,
    }


def test_configure_unknown_merge_policy():  # testConfigureUnknownMergePolicy
    with pytest.raises(RuntimeError, match="Unsupported mergePolicy: NotExistingMergePolicy"):
        LuceneSettings().update_settings(
            '{"mergePolicy": {"type": "NotExistingMergePolicy"}}'
        )


def test_simple_settings_from_json():  # testSimpleSettingsFromJson
    settings = LuceneSettings()
    settings.update_settings(
        '{"commitCount": 1, "commitTimeout": 1, "lruTaxonomyWriterCacheSize": 1,'
        ' "maxMergeAtOnce": 1, "segmentsPerTier": 1.0, "numberOfConcurrentTasks": 1}'
    )
    assert settings.commit_count == 1
    assert settings.commit_timeout == 1
    assert settings.lru_taxonomy_writer_cache_size == 1
    assert settings.number_of_concurrent_tasks == 1
    assert settings.merge_policy["maxMergeAtOnce"] == 1
    assert settings.merge_policy["segmentsPerTier"] == 1.0


def test_getters():  # testGetters
    settings = LuceneSettings(cache_facet_ordinals=False)
    assert settings.verbose
    assert settings.analyzer == {"type": "MerescoStandardAnalyzer"}


def test_create_default_analyzer():  # testCreateDefaultAnalyzers
    tok = LuceneSettings().create_analyzer()
    assert tok(["Hello World"]) == [["hello", "world"]]


def test_create_dutch_stemming_analyzer():  # testCreateNonDefaultAnalyzer
    settings = LuceneSettings(
        analyzer=dict(
            type="MerescoDutchStemmingAnalyzer", stemmingFields=["field_a", "field_b"]
        )
    )
    tok = settings.create_analyzer()
    assert settings.stemming_fields == ["field_a", "field_b"]
    # KeywordRepeat semantics: original + stem both emitted when they differ
    assert tok(["katten"]) == [["katten", "kat"]]


def test_create_whitespace_analyzer():  # testCreateWhiteSpaceAnalyzer
    tok = LuceneSettings(analyzer=dict(type="WhitespaceAnalyzer")).create_analyzer()
    assert tok(["Foo.Bar baz"]) == [["Foo.Bar", "baz"]]


def test_unknown_analyzer_raises():  # testUnknownAnalyzer (Java suite)
    with pytest.raises(RuntimeError, match="Unsupported analyzer"):
        LuceneSettings().update_settings('{"analyzer": {"type": "NopeAnalyzer"}}')


def test_similarity():  # testBM25Similarity(+WithKAndB) / testTermFrequencySimilarity
    assert isinstance(LuceneSettings().create_similarity(), BM25)
    sim = LuceneSettings(
        similarity={"type": "BM25Similarity", "k1": 1.2, "b": 0.75}
    ).create_similarity()
    assert (sim.k1, sim.b) == (1.2, 0.75)
    sim2 = LuceneSettings(
        similarity={"type": "TermFrequencySimilarity"}
    ).create_similarity()
    assert isinstance(sim2, TermFrequencySimilarity)


def test_cluster_config_from_settings_json():  # testClusterConfig
    settings = LuceneSettings()
    settings.update_settings(
        '{"clustering": {"clusterMoreRecords": 100, "strategies":'
        ' [{"clusteringEps": 0.4, "clusteringMinPoints": 1}]}}'
    )
    cc = settings.cluster_config
    assert cc is not None
    assert cc.cluster_more_records == 100
    assert cc.strategies[0].clustering_eps == 0.4
    assert cc.strategies[0].clustering_min_points == 1


def test_to_index_config():
    cfg = LuceneSettings(
        analyzer={"type": "MerescoDutchStemmingAnalyzer"},
        similarity={"type": "BM25Similarity", "k1": 1.2, "b": 0.75},
    ).to_index_config("content", num_shards=4)
    assert cfg.analyzer == "standard"
    assert cfg.stem == "dutch"
    assert (cfg.k1, cfg.b) == (1.2, 0.75)
    assert cfg.num_shards == 4
