"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in meresco_lucene_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted index
    over the documents table through the real engine, then run a BM25 top-10
    query; returns the hit table (doc_id, score)."""
    from meresco_lucene_ray.pipelines.entries import q_bm25_term

    return q_bm25_term("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus
    the training-data ops).  Each callable takes ``sf_dir`` and returns a
    pyarrow Table."""
    from meresco_lucene_ray.pipelines.entries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query.  68 of 70 entries are SQL-mirrored
    (incl. the FNV-hash family, autocomplete, multiprobe LSH ANN, recursive-
    CTE transitive closures for the connected-components family, and the
    stride-range chunking spec); only cluster_topdocs (DBSCAN+PageRank) and
    media_features (binary decode) are rows-only — both golden-pinned in
    tests/test_rows_only_goldens.py."""
    from meresco_lucene_ray.pipelines.entries import ORACLES

    return dict(ORACLES)
