"""LuceneSettings — the engine configuration surface, wire-compatible.

Re-expresses ``meresco/lucene/_lucenesettings.py`` (the Python settings
object posted as JSON, ``lucenesettingstest.py``) and
``src/org/meresco/lucene/LuceneSettings.java:50-230`` (the server-side
parse, ``LuceneSettingsTest.java``).  One object serves both directions:

- ``as_post_dict()`` renders the exact camelCase wire dict the reference
  client posts (defaults: lruTaxonomyWriterCacheSize=4000, TieredMergePolicy
  segmentsPerTier=8.0/maxMergeAtOnce=2, BM25Similarity,
  numberOfConcurrentTasks=6, MerescoStandardAnalyzer, commitCount=100000,
  commitTimeout=10, cacheFacetOrdinals=True, verbose=True).
- ``update_settings(json)`` applies a settings JSON like the server
  (unknown merge policies raise ``Unsupported mergePolicy: X``).
- ``create_analyzer()`` / ``create_similarity()`` build this engine's
  tokenizer function and scorer from the analyzer/similarity specs.
- ``to_index_config(...)`` derives the engine's IndexConfig so a reference
  deployment's settings JSON configures a Ray build directly.

Exercised by ``tests/test_settings.py`` mirroring both reference suites.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Any

from .analysis import make_tokenizer
from .fieldregistry import FieldRegistry
from .index.build import IndexConfig
from .query.scorer import BM25, TermFrequencySimilarity

__all__ = ["LuceneSettings"]

_MERGE_POLICY_KEYS = {
    "TieredMergePolicy": ("segmentsPerTier", "maxMergeAtOnce"),
    "LogDocMergePolicy": ("mergeFactor", "maxMergeDocs"),
}

_ANALYZER_KINDS = {
    "MerescoStandardAnalyzer": ("standard", None),
    "MerescoDutchStemmingAnalyzer": ("standard", "dutch"),
    "WhitespaceAnalyzer": ("whitespace", None),
    "ClassicAnalyzer": ("classic", None),
}


@dataclass
class LuceneSettings:
    commit_count: int = 100000
    commit_timeout: int = 10
    lru_taxonomy_writer_cache_size: int = 4000
    number_of_concurrent_tasks: int = 6
    merge_policy: dict = field(
        default_factory=lambda: {
            "type": "TieredMergePolicy", "segmentsPerTier": 8.0, "maxMergeAtOnce": 2,
        }
    )
    similarity: dict = field(default_factory=lambda: {"type": "BM25Similarity"})
    analyzer: dict = field(
        default_factory=lambda: {"type": "MerescoStandardAnalyzer"}
    )
    cache_facet_ordinals: bool = True
    verbose: bool = True
    field_registry: FieldRegistry | None = None
    cluster_config: Any = None

    def clone(self, **kw: Any) -> "LuceneSettings":
        return replace(self, **kw)

    # ---- wire form (asPostDict, _lucenesettings.py) ---------------------
    def as_post_dict(self) -> dict:
        drilldown_fields = []
        if self.field_registry is not None:
            for dim, spec in self.field_registry.drilldown_field_names.items():
                drilldown_fields.append(
                    {
                        "dim": dim,
                        "hierarchical": spec["hierarchical"],
                        "fieldname": spec["indexFieldName"],
                        "multiValued": spec["multiValued"],
                    }
                )
        return {
            "lruTaxonomyWriterCacheSize": self.lru_taxonomy_writer_cache_size,
            "mergePolicy": dict(self.merge_policy),
            "similarity": dict(self.similarity),
            "numberOfConcurrentTasks": self.number_of_concurrent_tasks,
            "analyzer": dict(self.analyzer),
            "drilldownFields": drilldown_fields,
            "commitCount": self.commit_count,
            "commitTimeout": self.commit_timeout,
            "cacheFacetOrdinals": self.cache_facet_ordinals,
            "verbose": self.verbose,
        }

    # ---- server-side parse (updateSettings, LuceneSettings.java:102-178) -
    def update_settings(self, settings_json: str | dict) -> "LuceneSettings":
        d = (
            json.loads(settings_json)
            if isinstance(settings_json, str)
            else settings_json
        )
        scalars = {
            "commitCount": "commit_count",
            "commitTimeout": "commit_timeout",
            "lruTaxonomyWriterCacheSize": "lru_taxonomy_writer_cache_size",
            "numberOfConcurrentTasks": "number_of_concurrent_tasks",
            "cacheFacetOrdinals": "cache_facet_ordinals",
            "verbose": "verbose",
        }
        for wire, attr in scalars.items():
            if wire in d:
                setattr(self, attr, d[wire])
        # loose Tiered knobs at the top level (testSimpleSettingsFromJson)
        for knob in ("segmentsPerTier", "maxMergeAtOnce"):
            if knob in d:
                self.merge_policy[knob] = d[knob]
        if "mergePolicy" in d:
            mp = dict(d["mergePolicy"])
            if mp.get("type") not in _MERGE_POLICY_KEYS:
                raise RuntimeError(f"Unsupported mergePolicy: {mp.get('type')}")
            self.merge_policy = mp
        if "similarity" in d:
            self.similarity = dict(d["similarity"])
        if "analyzer" in d:
            spec = dict(d["analyzer"])
            if spec.get("type") not in _ANALYZER_KINDS:
                raise RuntimeError(f"Unsupported analyzer: {spec.get('type')}")
            self.analyzer = spec
        if "clustering" in d:
            from .cluster import ClusterConfig

            self.cluster_config = ClusterConfig.from_dict(d["clustering"])
        if "drilldownFields" in d:
            reg = self.field_registry or FieldRegistry()
            for dd in d["drilldownFields"]:
                reg.register_drilldown_field(
                    dd["dim"],
                    hierarchical=bool(dd.get("hierarchical", False)),
                    multi_valued=bool(dd.get("multiValued", True)),
                    index_field_name=dd.get("fieldname"),
                )
            self.field_registry = reg
        return self

    # ---- engine construction -------------------------------------------
    def create_analyzer(self):
        """Analyzer spec → engine tokenizer fn (createAnalyzer,
        LuceneSettings.java:119-137)."""
        kind, stem = _ANALYZER_KINDS[self.analyzer["type"]]
        return make_tokenizer(kind, stem=stem)

    @property
    def stemming_fields(self) -> list[str]:
        return list(self.analyzer.get("stemmingFields", []))

    def create_similarity(self):
        """Similarity spec → engine scorer (createSimilarity,
        LuceneSettings.java:179-191)."""
        t = self.similarity["type"]
        if t == "BM25Similarity":
            kw = {}
            if "k1" in self.similarity:
                kw["k1"] = float(self.similarity["k1"])
            if "b" in self.similarity:
                kw["b"] = float(self.similarity["b"])
            return BM25(**kw)
        if t == "TermFrequencySimilarity":
            return TermFrequencySimilarity()
        raise RuntimeError(f"Unsupported similarity: {t}")

    def to_index_config(self, text_col: str, **kw: Any) -> IndexConfig:
        """Settings → engine IndexConfig: analyzer kind/stemming and BM25
        parameters carry over; commit/merge knobs are advisory (the Ray
        build commits per segment atomically)."""
        kind, stem = _ANALYZER_KINDS[self.analyzer["type"]]
        cfg_kw: dict[str, Any] = {"analyzer": kind, "stem": stem}
        if self.analyzer.get("stemmingFields"):
            # MerescoDutchStemmingAnalyzer(String[]) — stem only those fields
            cfg_kw["stem_fields"] = tuple(self.analyzer["stemmingFields"])
        sim = self.create_similarity()
        if isinstance(sim, BM25):
            cfg_kw.update(k1=sim.k1, b=sim.b)
        cfg_kw.update(kw)
        return IndexConfig(text_col=text_col, **cfg_kw)
