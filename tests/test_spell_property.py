"""Property test: bucketed spell suggester ≡ dict-scan oracle (Q14/ST5).

test_spell_bucketed.py pins three fixed query terms over one vocabulary;
hypothesis here draws a fresh vocabulary + df assignment per example and a
query term (sometimes indexed, sometimes not; sometimes sharing no prefix
with any term), across all three DirectSpellChecker modes, min_prefix 1–2
and max_distance 1–3, asserting `spell_suggest_bucketed` over a row-group-
mode TermStatsReader returns EXACTLY the dict-path `spell_suggest` result
(which is itself a transparent brute-force scan).  Stress points: tiny
row groups (bucket boundaries inside a prefix range), 'z'-prefix upper
bound, count truncation on df ties, MORE_POPULAR with the query term's own
df at both extremes.
"""

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.query.engine import TermStatsReader
from meresco_lucene_ray.suggest.spell import spell_suggest, spell_suggest_bucketed

_ALPHABET = "amz_1"

_WORD = st.text(alphabet=_ALPHABET, min_size=1, max_size=6)

_CASE = st.tuples(
    st.dictionaries(_WORD, st.integers(min_value=1, max_value=5), min_size=1, max_size=60),
    _WORD,
    st.booleans(),  # query a term drawn FROM the vocab instead
    st.sampled_from(["NOT_IN_INDEX", "MORE_POPULAR", "ALWAYS"]),
    st.integers(min_value=1, max_value=2),  # min_prefix
    st.integers(min_value=1, max_value=3),  # max_distance
    st.integers(min_value=1, max_value=4),  # count
)


@settings(max_examples=120, deadline=None)
@given(case=_CASE)
def test_bucketed_equals_dict_on_random_vocab(case):
    dfs, term, pick_indexed, mode, min_prefix, max_distance, count = case
    if pick_indexed:
        term = sorted(dfs)[len(dfs) // 2]
    terms = sorted(dfs)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "termstats.parquet")
        pq.write_table(
            pa.table(
                {
                    "term": pa.array(terms, type=pa.string()),
                    "df": pa.array([dfs[t] for t in terms], type=pa.int64()),
                }
            ),
            path,
            row_group_size=7,  # force many bucket-internal row-group edges
        )
        reader = TermStatsReader(path, max_full_load_rows=0)
        got = spell_suggest_bucketed(
            reader, term, count=count, max_distance=max_distance,
            mode=mode, min_prefix=min_prefix,
        )
        exp = spell_suggest(
            dfs, term, count=count, max_distance=max_distance,
            mode=mode, min_prefix=min_prefix,
        )
        assert got == exp, (term, mode, min_prefix, max_distance, count)
