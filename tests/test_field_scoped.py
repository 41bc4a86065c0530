"""Per-field text postings + field-scoped BM25 (the reference keeps per-field
Lucene postings — DocumentStringToDocument.java:84-158; every reference
integration fixture indexes field1..field5).  Extra text fields are keyed
"<field>\\x1f<term>" in the one sorted dictionary; each field has its own
positions, doc lengths and avgdl."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import (
    BoolQ,
    IndexSearcher,
    MatchAllQ,
    PhraseQ,
    PrefixQ,
    TermQ,
    WildcardQ,
)
from meresco_lucene_ray.query.scorer import BM25


@pytest.fixture(scope="module")
def two_field_index(ray_session, tmp_path_factory):
    import ray.data as rd

    # 'shared' appears in BOTH fields of doc a0 but only in body of a1 and
    # only in title of a2; token streams differ per field
    rows = {
        "__id__": ["a0", "a1", "a2", "a3"],
        "body": [
            "shared alpha beta gamma",
            "shared shared delta",
            "epsilon zeta",
            "eta theta iota kappa lambda",
        ],
        "title": [
            "shared title one",
            "plain heading",
            "shared heading two words",
            "other heading",
        ],
        "lang": ["en", "en", "de", "de"],
    }
    d = str(tmp_path_factory.mktemp("pf") / "idx")
    cfg = IndexConfig(
        text_col="body",
        id_col="__id__",
        text_fields=("title",),
        stored_cols=("lang",),
        num_shards=2,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return d, rows


def _ids(res):
    return sorted(res.hits["__id__"].to_pylist())


def test_scoped_term_matches_only_its_field(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    # default field (body): a0, a1
    assert _ids(s.execute(TermQ("shared"), stop=10)) == ["a0", "a1"]
    # scoped to title: a0, a2
    assert _ids(s.execute(TermQ("shared", field="title"), stop=10)) == ["a0", "a2"]
    # token only in title never matches the default field
    assert s.count(TermQ("heading")) == 0
    assert s.count(TermQ("heading", field="title")) == 3


def test_scoped_bm25_uses_field_stats(two_field_index):
    d, rows = two_field_index
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25, score_f32=False)
    res = s.execute(TermQ("shared", field="title"), stop=10)
    hits = {h["__id__"]: h["score"] for h in res.hits.to_pylist()}
    # expected: N=4, df=2 (title docs with 'shared'), per-title dl and avgdl
    dls = {i: len(t.split()) for i, t in zip(rows["__id__"], rows["title"])}
    avgdl = sum(dls.values()) / 4
    sim = BM25(k1=0.9, b=0.4)
    for i in ("a0", "a2"):
        want = float(sim.score(np.array([1.0]), np.array([float(dls[i])]), 4, 2, avgdl)[0])
        assert hits[i] == pytest.approx(want, rel=1e-12)
    # and the default-field score for the same token uses BODY stats (df=2
    # in body, body dl/avgdl) — different value
    res_b = s.execute(TermQ("shared"), stop=10)
    hits_b = {h["__id__"]: h["score"] for h in res_b.hits.to_pylist()}
    bdls = {i: len(t.split()) for i, t in zip(rows["__id__"], rows["body"])}
    bavg = sum(bdls.values()) / 4
    want_b = float(sim.score(np.array([1.0]), np.array([float(bdls["a0"])]), 4, 2, bavg)[0])
    assert hits_b["a0"] == pytest.approx(want_b, rel=1e-12)
    assert hits_b["a0"] != hits["a0"]


def test_scoped_phrase_prefix_wildcard(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    # phrase within the title field only
    assert _ids(s.execute(PhraseQ(("shared", "heading"), field="title"), stop=10)) == ["a2"]
    assert s.count(PhraseQ(("shared", "heading"))) == 0  # not adjacent in any body
    # prefix scoped to title: 'head*' → heading (3 docs)
    assert s.count(PrefixQ("head", field="title")) == 3
    assert s.count(PrefixQ("head")) == 0
    # wildcard scoped
    assert s.count(WildcardQ("w*rds", field="title")) == 1
    assert s.count(WildcardQ("w*rds")) == 0


def test_cross_field_bool_and_filters(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    q = BoolQ(must=(TermQ("shared"), TermQ("shared", field="title")))
    assert _ids(s.execute(q, stop=10)) == ["a0"]
    q2 = BoolQ(should=(TermQ("delta"), TermQ("two", field="title")))
    assert _ids(s.execute(q2, stop=10)) == ["a1", "a2"]


def test_prefix_search_does_not_leak_field_keys(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    # default-field term listings skip "<field>\x1f..." keys entirely
    terms = s.prefix_search("", limit=1000)
    names = [t for t, _ in terms]
    assert all("\x1f" not in t for t in names)
    assert "heading" not in names  # title-only token is not a body term


def test_prefix_search_field_scoped(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    # scoped to the per-field text column: title terms with their title df
    title_terms = dict(s.prefix_search("", limit=1000, field="title"))
    assert title_terms["heading"] == 3
    assert title_terms["shared"] == 2  # title df, not body df (2 docs, tf 1)
    assert "alpha" not in title_terms  # body-only token
    assert all("\x1f" not in t for t in title_terms)
    # 'h' prefix scoped to title
    assert dict(s.prefix_search("h", limit=10, field="title")) == {"heading": 3}
    # naming the default text column ≡ the unscoped scan
    assert s.prefix_search("sh", limit=10, field="body") == s.prefix_search("sh", limit=10)
    # a stored keyword column: distinct values + counts via the facet path
    assert s.prefix_search("", limit=10, field="lang") == [("de", 2), ("en", 2)]
    assert s.prefix_search("e", limit=10, field="lang") == [("en", 2)]
    # an unknown field yields no terms
    assert s.prefix_search("a", limit=10, field="nosuch") == []


def test_unscoped_queries_unchanged_on_multifield_index(two_field_index):
    d, _ = two_field_index
    s = IndexSearcher(d, num_actors=2, num_cpus=0.25)
    assert s.count(MatchAllQ()) == 4
    assert s.count(TermQ("alpha")) == 1
    # match-all still returns every doc once (no double counting from the
    # title postings)
    res = s.execute(MatchAllQ(), stop=10)
    assert sorted(res.hits["__id__"].to_pylist()) == ["a0", "a1", "a2", "a3"]


def test_per_field_stemming(ray_session, tmp_path_factory):
    import ray.data as rd

    # stem_fields=('title',): Dutch stemming applies ONLY to title —
    # MerescoDutchStemmingAnalyzer(String[]) semantics (emit stemmed+original)
    rows = {
        "__id__": ["d0"],
        "body": ["katten"],
        "title": ["katten"],
    }
    d = str(tmp_path_factory.mktemp("pfstem") / "idx")
    cfg = IndexConfig(
        text_col="body",
        id_col="__id__",
        text_fields=("title",),
        stem="dutch",
        stem_fields=("title",),
        num_shards=1,
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    s = IndexSearcher(d, num_actors=1, num_cpus=0.25)
    # title: stemmed form 'kat' AND original 'katten' both indexed
    assert s.count(TermQ("kat", field="title")) == 1
    assert s.count(TermQ("katten", field="title")) == 1
    # body: NOT stemmed
    assert s.count(TermQ("kat")) == 0
    assert s.count(TermQ("katten")) == 1


def test_multifield_all_empty_docs_positions(ray_session, tmp_path_factory):
    """Multifield twin of the empty-shard positions guard: a batch whose
    docs tokenize to zero tokens in EVERY field used to build out_starts=[0]
    against an empty run list and crash the tokenize stage's np.repeat
    (found by auditing the build_segment fix's pattern)."""
    import ray.data as rd

    from meresco_lucene_ray.query import MatchAllQ

    d = str(tmp_path_factory.mktemp("mf_empty") / "idx")
    cfg = IndexConfig(
        text_col="body",
        id_col="__id__",
        text_fields=("title",),
        num_shards=1,
        store_positions=True,
    )
    build_index(
        rd.from_arrow(
            pa.table({"__id__": ["a", "b"], "body": ["", ""], "title": ["", ""]})
        ),
        d,
        cfg,
    )
    with IndexSearcher(d, num_actors=1, num_cpus=0.25) as s:
        assert s.count(MatchAllQ()) == 2
        assert s.count(TermQ("x")) == 0
        assert s.count(TermQ("x", field="title")) == 0
