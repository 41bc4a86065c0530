"""Spell suggestions — DirectSpellChecker analog.

Reference: ``DirectSpellChecker.suggestSimilar(term, count, mode)`` scans
index terms within edit distance of the query term
(/root/reference/src/org/meresco/lucene/Lucene.java:804-816); modes
NOT_IN_INDEX / MORE_POPULAR / ALWAYS (JsonQueryConverter.java:163-187).
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    """Classic unit-cost edit distance (equal to DuckDB's levenshtein)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def spell_suggest(
    term_dfs: dict[str, int],
    term: str,
    count: int = 10,
    max_distance: int = 2,
    mode: str = "NOT_IN_INDEX",
) -> list[tuple[str, int, int]]:
    """(term, df, distance) suggestions, most-frequent first.

    mode NOT_IN_INDEX: no suggestions when the term itself is indexed;
    MORE_POPULAR: only terms with higher df than the query term;
    ALWAYS: suggest regardless."""
    own_df = term_dfs.get(term, 0)
    if mode == "NOT_IN_INDEX" and own_df > 0:
        return []
    out = []
    for t, df in term_dfs.items():
        if abs(len(t) - len(term)) > max_distance or t == term:
            continue
        if mode == "MORE_POPULAR" and df <= own_df:
            continue
        d = levenshtein(t, term)
        if d <= max_distance:
            out.append((t, df, d))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:count]
