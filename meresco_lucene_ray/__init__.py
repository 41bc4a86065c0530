"""meresco_lucene_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the *capabilities* of seecr/meresco-lucene
(reference at /root/reference, snapshot 2026-01-16) on Ray Data:

- inverted-index build as a ``ray.data.Dataset`` pipeline
  (``map_batches`` tokenize → ``groupby(shard)`` segment build →
  ``groupby(term)`` global term-stats aggregate → actor-pool merge),
- BM25 (k1=0.9, b=0.4) top-k query engine over document-sharded
  segments served by a stateful actor pool,
- facets, dedup/grouping, key-bitset semi-joins, rank-query blending,
  spell suggestions, more-like-this, autocomplete, clustering,
- plus large-scale training-data ops: exact/MinHash-LSH/SimHash dedup,
  ANN cosine search, text quality/langid/token stats.

Nothing here calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
