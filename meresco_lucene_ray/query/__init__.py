from .ast import (
    GeoDistanceQ,
    TermQ,
    BoolQ,
    PhraseQ,
    PrefixQ,
    WildcardQ,
    RangeQ,
    MatchAllQ,
    DocValEqQ,
    KeyFilterQ,
    RelationalQ,
    Occur,
)
from .scorer import bm25_idf, bm25_tf_weight, BM25, TermFrequencySimilarity
from .engine import IndexSearcher, SearchResult

__all__ = [
    "GeoDistanceQ",
    "TermQ",
    "BoolQ",
    "PhraseQ",
    "PrefixQ",
    "WildcardQ",
    "RangeQ",
    "MatchAllQ",
    "DocValEqQ",
    "KeyFilterQ",
    "RelationalQ",
    "Occur",
    "bm25_idf",
    "bm25_tf_weight",
    "BM25",
    "TermFrequencySimilarity",
    "IndexSearcher",
    "SearchResult",
]
