"""Independent brute-force oracle for rank-identity tests.

Straight-line Python/numpy BM25 + boolean evaluation over an in-memory doc
list — deliberately shares NOTHING with the engine except the frozen
tokenizer spec (which index and query side must share by design, mirroring
how the reference reuses one analyzer on both sides —
/root/reference/src/org/meresco/lucene/analysis/MerescoStandardAnalyzer.java:75-96).

Used the way LuceneTest golden values validate scoring (SURVEY.md §5).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np


from ..analysis import tokenize


def _f32(x: float) -> float:
    """Final float32 rounding, matching Lucene's float scores."""
    return float(np.float32(x))


class BruteForceIndex:
    def __init__(self, ids: list[str], texts: list[str], k1: float = 0.9, b: float = 0.4):
        self.ids = ids
        self.toks = [tokenize(t) for t in texts]
        self.tfs = [Counter(t) for t in self.toks]
        self.dl = [len(t) for t in self.toks]
        self.N = len(ids)
        self.avgdl = sum(self.dl) / self.N if self.N else 0.0
        self.df: Counter = Counter()
        for tf in self.tfs:
            self.df.update(tf.keys())
        self.k1, self.b = k1, b

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def score_term(self, i: int, term: str, boost: float = 1.0) -> float:
        tf = self.tfs[i].get(term, 0)
        if tf == 0:
            return 0.0
        norm = tf / (tf + self.k1 * (1 - self.b + self.b * self.dl[i] / self.avgdl))
        return boost * self.idf(term) * norm

    def matches_term(self, i: int, term: str) -> bool:
        return term in self.tfs[i]

    def phrase_freq(self, i: int, terms: tuple[str, ...]) -> int:
        toks = self.toks[i]
        cnt = 0
        for p in range(len(toks) - len(terms) + 1):
            if all(toks[p + j] == terms[j] for j in range(len(terms))):
                cnt += 1
        return cnt

    def score_phrase(self, i: int, terms: tuple[str, ...], boost: float = 1.0) -> float:
        f = self.phrase_freq(i, terms)
        if f == 0:
            return 0.0
        idf_sum = sum(self.idf(t) for t in terms)
        norm = f / (f + self.k1 * (1 - self.b + self.b * self.dl[i] / self.avgdl))
        return boost * idf_sum * norm

    def top_k_or(self, terms: list[str], k: int = 10) -> list[tuple[str, float]]:
        """Disjunctive BM25 top-k: score = sum of matching term scores."""
        out = []
        for i in range(self.N):
            s = sum(self.score_term(i, t) for t in terms)
            if any(self.matches_term(i, t) for t in terms):
                out.append((self.ids[i], _f32(s)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def top_k_and(self, terms: list[str], k: int = 10) -> list[tuple[str, float]]:
        out = []
        for i in range(self.N):
            if all(self.matches_term(i, t) for t in terms):
                out.append((self.ids[i], _f32(sum(self.score_term(i, t) for t in terms))))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def top_k_phrase(self, terms: tuple[str, ...], k: int = 10) -> list[tuple[str, float]]:
        out = []
        for i in range(self.N):
            s = self.score_phrase(i, terms)
            if s > 0:
                out.append((self.ids[i], _f32(s)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]
