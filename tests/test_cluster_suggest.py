"""Clustering (Q12) and suggestion subsystem (O27 + Q14) tests."""

import numpy as np
import pytest

from meresco_lucene_ray.cluster import (
    cluster_texts,
    dbscan,
    distance_matrix,
    generalized_jaccard_distance,
    interpolate_eps,
    pagerank,
    term_vectors,
)
from meresco_lucene_ray.suggest import (
    AutocompleteReader,
    build_suggestion_index,
    levenshtein,
    spell_suggest,
)


def test_generalized_jaccard():
    a = {"x": 2.0, "y": 1.0}
    b = {"x": 1.0, "y": 1.0}
    # min sum = 1+1=2; max sum = 2+1=3 → distance 1/3
    assert generalized_jaccard_distance(a, b) == pytest.approx(1 / 3)
    assert generalized_jaccard_distance(a, a) == 0.0
    assert generalized_jaccard_distance(a, {"z": 1.0}) == 1.0
    assert generalized_jaccard_distance({}, a) == 1.0


def test_dbscan_labels():
    # two tight groups + an outlier
    d = np.ones((5, 5))
    np.fill_diagonal(d, 0)
    d[0, 1] = d[1, 0] = 0.1
    d[2, 3] = d[3, 2] = 0.1
    labels = dbscan(d, eps=0.2, min_points=2)
    assert labels[0] == labels[1] != -1
    assert labels[2] == labels[3] != -1
    assert labels[0] != labels[2]
    assert labels[4] == -1  # noise


def test_pagerank_prefers_connected():
    sim = np.array(
        [
            [0, 0.9, 0.9],
            [0.9, 0, 0.1],
            [0.9, 0.1, 0],
        ]
    )
    r = pagerank(sim)
    assert r[0] == max(r)
    assert r.sum() == pytest.approx(1.0, abs=0.2)


def test_interpolate_eps():
    assert interpolate_eps(0.4, 100, 100) == 0.4
    assert interpolate_eps(0.4, 50, 100) == pytest.approx(0.2)


def test_cluster_texts_end_to_end():
    texts = (
        ["spark shuffle partition stage executor"] * 3
        + ["lucene index segment merge posting"] * 3
        + ["completely unrelated words about cooking pasta"]
    )
    clusters = cluster_texts(texts, eps=0.5, min_points=2)
    assert len(clusters) == 2
    members = sorted(tuple(sorted(c.doc_indices)) for c in clusters)
    assert members == [(0, 1, 2), (3, 4, 5)]
    for c in clusters:
        assert c.representative in c.doc_indices
        assert len(c.top_terms) > 0


def test_levenshtein_golden():
    assert levenshtein("query", "qurey") == 2
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("", "ab") == 2
    assert levenshtein("kitten", "sitting") == 3


def test_spell_suggest_modes():
    dfs = {"merge": 100, "marge": 5, "merges": 40, "zzz": 1}
    got = spell_suggest(dfs, "mrge", count=3)
    assert [t for t, _, _ in got] == ["merge", "merges", "marge"]
    # NOT_IN_INDEX: indexed term → no suggestions
    assert spell_suggest(dfs, "merge", mode="NOT_IN_INDEX") == []
    # MORE_POPULAR: only higher-df terms
    got = spell_suggest(dfs, "marge", mode="MORE_POPULAR")
    assert all(df > 5 for _, df, _ in got)


@pytest.fixture(scope="module")
def suggestion_index(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    rows = pa.table(
        {
            "title": [
                "harry potter",
                "harry potter and the chamber",
                "harry the hamster",
                "lord of the rings",
            ],
            "key": pa.array([1, 1, 2, 3], type=pa.int64()),
        }
    )
    path = str(tmp_path_factory.mktemp("sugg") / "suggestions.parquet")
    build_suggestion_index(rd.from_arrow(rows), "title", path, key_col="key")
    return AutocompleteReader(path)


def test_autocomplete_prefix(suggestion_index):
    got = [s for s, _ in suggestion_index.suggest("har")]
    assert got[0] in ("harry", "harry potter")
    assert any("harry" in s for s in got)


def test_autocomplete_phrase_and_filter(suggestion_index):
    got = [s for s, _ in suggestion_index.suggest("harry pot")]
    assert any(s.startswith("harry potter") for s in got)
    # key-set filter (SuggestionNGramKeysFilter analog)
    got_k2 = [s for s, _ in suggestion_index.suggest("har", filter_keys={2})]
    assert all("hamster" in s or s in ("harry", "harry the", "the") or "harry" in s for s in got_k2)
    got_k3 = suggestion_index.suggest("har", filter_keys={3})
    assert got_k3 == []


def test_suggestion_type_creator_filters(ray_session, tmp_path):
    """O27a term scheme: type$$--$$creator$$--$$value suggestions with
    field=value filters (SuggestionIndex.java:57,116; createFilter :268-280)."""
    import ray.data as rd
    import pyarrow as pa

    from meresco_lucene_ray.suggest.autocomplete import (
        AutocompleteReader,
        build_suggestion_index,
    )

    rows = pa.table(
        {
            "title": ["harry potter", "harry beton", "harry potter"],
            "typ": ["uri:book", "uri:book", "uri:movie"],
            "who": ["rowling", None, "columbus"],
            "key": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    path = str(tmp_path / "sugg_tc.parquet")
    build_suggestion_index(
        rd.from_arrow(rows), "title", path, key_col="key",
        type_col="typ", creator_col="who",
    )
    r = AutocompleteReader(path)
    # unfiltered: all shingles reachable
    assert {s for s, _ in r.suggest("ha")} >= {"harry"}
    # type filter: 'harry potter' exists as book AND movie
    movie = r.suggest("harry potter", filters=["type=uri:movie"])
    assert [s for s, _ in movie] == ["harry potter"]
    idx = [
        i for i, sh in enumerate(r.shingles)
        if sh == "harry potter" and r.types[i] == "uri:movie"
    ]
    assert idx and r.creators[idx[0]] == "columbus"
    # creator filter
    rowling = {s for s, _ in r.suggest("harry", filters=["creator=rowling"])}
    assert rowling == {"harry", "harry potter", "potter"} & rowling and "harry" in rowling
    # conjunction of filters
    both = r.suggest("harry", filters=["type=uri:book", "creator=rowling"])
    assert {s for s, _ in both} <= {"harry", "harry potter", "potter"}
    assert r.suggest("harry", filters=["type=uri:cd"]) == []
    # missing creator stored as empty string
    beton = r.suggest("harry beton", filters=["creator="])
    assert [s for s, _ in beton] == ["harry beton"]


def test_vectorized_explode_matches_per_row_spec(ray_session, tmp_path):
    """The Arrow-vectorized shingle explode produces EXACTLY the multiset of
    (shingle, keys) rows the per-row reference spec defines
    (SuggestionIndex.java:94-121: tokenize, shingle lengths 1..3, the
    type$$--$$creator$$--$$value term scheme) — including unicode values,
    null values, null types/creators and missing keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from meresco_lucene_ray.analysis import tokenize
    from meresco_lucene_ray.suggest.autocomplete import (
        CONCAT_MARKER,
        build_suggestion_index,
    )

    values = [
        "Harry Potter and the Stone",
        None,
        "  punctuation, splits; here!  ",
        "ünïcode Grüße straße",
        "one",
        "",
        "a b a b a",
    ]
    types = ["book", None, "page", None, "book", None, "x"]
    creators = [None, "rowling", None, "göthe", "x", None, None]
    keys = [1, 2, None, 4, 5, 6, 7]
    rows = pa.table(
        {"value": pa.array(values), "type": pa.array(types),
         "creator": pa.array(creators), "key": pa.array(keys, type=pa.int64())}
    )
    path = str(tmp_path / "sugg.parquet")
    build_suggestion_index(
        rd.from_arrow(rows), "value", path, key_col="key",
        type_col="type", creator_col="creator",
    )
    got = pq.read_table(path)

    expect: dict[str, tuple[int, set]] = {}
    for v, ty, cr, k in zip(values, types, creators, keys):
        toks = tokenize(v or "")
        prefix = f"{ty or ''}{CONCAT_MARKER}{cr or ''}{CONCAT_MARKER}"
        for n in range(1, 4):
            for i in range(len(toks) - n + 1):
                sh = prefix + " ".join(toks[i : i + n])
                cnt, ks = expect.get(sh, (0, set()))
                if k is not None:  # null keys never reach the keys list
                    ks.add(k)
                expect[sh] = (cnt + 1, ks)
    got_map = {
        s: (int(c), set(kk))
        for s, c, kk in zip(
            got["shingle"].to_pylist(), got["count"].to_pylist(), got["keys"].to_pylist()
        )
    }
    assert got_map == expect
