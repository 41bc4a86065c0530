"""Scale-safe spell suggester: O(bucket) reads + vectorized Levenshtein.

The spell path must never materialize the whole vocabulary (the round-1/2
driver-OOM trap): candidates share the query term's first character
(DirectSpellChecker minPrefix=1), living in ONE contiguous range of the
term-sorted termstats.parquet, read row-group by row-group.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meresco_lucene_ray.query.engine import TermStatsReader
from meresco_lucene_ray.suggest.spell import (
    levenshtein,
    levenshtein_batch,
    spell_suggest,
    spell_suggest_bucketed,
)


def test_levenshtein_batch_matches_scalar():
    rng = np.random.default_rng(7)
    alphabet = list("abcdefg_0123")
    cands = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 9)).tolist()) for _ in range(500)
    ]
    term = "cafe_1"
    got = levenshtein_batch(pa.array(cands, type=pa.string()), term)
    exp = np.array([levenshtein(c, term) for c in cands])
    assert (got == exp).all()


def test_levenshtein_batch_non_ascii_fallback():
    cands = pa.array(["café", "cafe", "capé"], type=pa.string())
    got = levenshtein_batch(cands, "cafe")
    assert got.tolist() == [levenshtein(c, "cafe") for c in cands.to_pylist()]


@pytest.fixture(scope="module")
def stats_file(tmp_path_factory):
    """A term-sorted stats table spanning many initials, tiny row groups →
    many row groups, so bucket pruning is observable."""
    rng = np.random.default_rng(3)
    terms = set()
    for first in "abcdefghijklmnopqrstuvwxyz":
        for _ in range(120):
            terms.add(first + "".join(rng.choice(list("aeimrst"), size=rng.integers(2, 7)).tolist()))
    terms = sorted(terms)
    dfs = rng.integers(1, 1000, size=len(terms))
    path = str(tmp_path_factory.mktemp("stats") / "termstats.parquet")
    pq.write_table(
        pa.table({"term": pa.array(terms, type=pa.string()), "df": pa.array(dfs, type=pa.int64())}),
        path,
        row_group_size=100,
    )
    return path, dict(zip(terms, (int(d) for d in dfs)))


def test_bucketed_equals_dict_scan(stats_file):
    path, dfs = stats_file
    reader = TermStatsReader(path, max_full_load_rows=0)  # force row-group mode
    for term in ("mrse", "aeim", "tastt"):
        got = spell_suggest_bucketed(reader, term, count=10)
        exp = spell_suggest(dfs, term, count=10)
        assert got == exp, term


def test_bucketed_reads_only_the_bucket(stats_file):
    path, dfs = stats_file
    reader = TermStatsReader(path, max_full_load_rows=0)
    total_groups = reader._pf.metadata.num_row_groups
    assert total_groups > 20
    got = spell_suggest_bucketed(reader, "mrse", count=10)
    assert got  # the bucket has candidates
    # 'm' bucket ≈ 120 terms ≈ 2 row groups (+1 boundary, +1 for df_of(term))
    assert reader.rg_reads <= 5 < total_groups


def test_full_load_range_stats_slices(stats_file):
    path, dfs = stats_file
    reader = TermStatsReader(path)  # small table → full arrays
    chunks = list(reader.range_stats("m", "n"))
    assert len(chunks) == 1
    terms = chunks[0][0].to_pylist()
    assert terms and all(t.startswith("m") for t in terms)
    assert set(terms) == {t for t in dfs if t.startswith("m")}
