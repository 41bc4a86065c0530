"""Similarity functions.

BM25 per Lucene ≥ 8 (no (k1+1) numerator):

    score = boost * idf * tf / (tf + k1 * (1 - b + b * dl/avgdl))
    idf   = ln(1 + (N - df + 0.5) / (df + 0.5))

Golden check (reference /root/reference/test/_integration/luceneservertest.py,
testAddAndQueryDocument): N=1, df=1, tf=1, dl=avgdl, k1=1.2, b=0.75 →
0.13076457381248474.  Defaults here follow BASELINE.json: k1=0.9, b=0.4.

Norms: we use the EXACT document length (no Lucene SmallFloat 1-byte
quantization). The engine and its oracle share this one normalization spec —
rank-identity is asserted against that spec (see SURVEY.md §7.4).

``TermFrequencySimilarity`` mirrors
/root/reference/src/org/meresco/lucene/search/TermFrequencySimilarity.java:40-59:
score = tf/1000 * boost, length norms ignored.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def bm25_idf(N: int, df) -> np.ndarray | float:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_tf_weight(tf, dl, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass(frozen=True)
class BM25:
    k1: float = 0.9
    b: float = 0.4

    def idf(self, N: int, df):
        return bm25_idf(N, df)

    def score(self, tf, dl, N: int, df, avgdl: float, boost: float = 1.0):
        return boost * self.idf(N, df) * bm25_tf_weight(tf, dl, avgdl, self.k1, self.b)


@dataclass(frozen=True)
class TermFrequencySimilarity:
    """score = tf / 1000 * boost; norm ≡ 1."""

    def score(self, tf, dl, N: int, df, avgdl: float, boost: float = 1.0):
        return np.asarray(tf, dtype=np.float64) * (boost / 1000.0)
