"""CQL front-end golden ASTs (mirrors queryexpressiontolucenequerydicttest
style) + SchemaPolicy resolution + TermNumerator."""

import pytest

from meresco_lucene_ray.cql import CqlConfig, CqlParseError, cql_to_query
from meresco_lucene_ray.query.ast import (
    BoolQ,
    DocValEqQ,
    MatchAllQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    TermQ,
)
from meresco_lucene_ray.schema import FieldDef, Role, SchemaPolicy, facet_path

CFG = CqlConfig(
    text_col="text",
    keyword_cols=frozenset({"lang", "source"}),
    numeric_cols=frozenset({"n_chars"}),
)


def test_bare_term():
    assert cql_to_query("merge", CFG) == TermQ("merge")


def test_boost():
    assert cql_to_query("merge^2.5", CFG) == TermQ("merge", boost=2.5)


def test_quoted_phrase():
    assert cql_to_query('"batch stream"', CFG) == PhraseQ(("batch", "stream"))


def test_prefix():
    assert cql_to_query("val*", CFG) == PrefixQ("val")


def test_matchall():
    assert cql_to_query("*", CFG) == MatchAllQ()
    assert cql_to_query("", CFG) == MatchAllQ()


def test_keyword_eq():
    assert cql_to_query("lang = en", CFG) == DocValEqQ("lang", "en")
    assert cql_to_query("lang == en", CFG) == DocValEqQ("lang", "en")


def test_range():
    # absent bounds are flagged inclusive, mirroring _termRangeQuery's
    # `includeLower = relation == '>=' or lowerTerm is None` (:184)
    assert cql_to_query("n_chars >= 100", CFG) == RangeQ(
        "n_chars", lo=100, hi=None, include_lo=True, include_hi=True
    )
    assert cql_to_query("n_chars < 300", CFG) == RangeQ(
        "n_chars", lo=None, hi=300, include_lo=True, include_hi=False
    )


def test_boolean_and_not():
    q = cql_to_query("merge AND hash NOT spark", CFG)
    assert q == BoolQ(must=(TermQ("merge"), TermQ("hash")), must_not=(TermQ("spark"),))


def test_boolean_or_parens():
    q = cql_to_query("(merge OR hash) AND lang = en", CFG)
    assert q == BoolQ(
        must=(BoolQ(should=(TermQ("merge"), TermQ("hash"))), DocValEqQ("lang", "en"))
    )


def test_unqualified_multifield_expansion():
    cfg = CqlConfig(text_col="text", unqualified_fields=(("text", 1.0), ("text", 3.0)))
    q = cql_to_query("merge", cfg)
    assert q == BoolQ(should=(TermQ("merge", boost=1.0), TermQ("merge", boost=3.0)))


def test_errors():
    with pytest.raises(CqlParseError):
        cql_to_query("unknownfield = x", CFG)
    with pytest.raises(CqlParseError):
        cql_to_query("lang = en)", CFG)
    with pytest.raises(CqlParseError):
        cql_to_query("n_chars = 1 AND (", CFG)


# ---- SchemaPolicy -----------------------------------------------------------

def test_schema_prefix_rules():
    p = SchemaPolicy()
    assert p.resolve("__id__").role is Role.ID
    assert p.resolve("sorted.title").role is Role.KEYWORD
    assert p.resolve("sorted.title").sort is True
    assert p.resolve("untokenized.isbn").role is Role.KEYWORD
    assert p.resolve("__key__.group").role is Role.KEY
    assert p.resolve("__numeric__.year").role is Role.NUMERIC
    assert p.resolve("range.int.age").role is Role.NUMERIC
    assert p.resolve("body").role is Role.TEXT


def test_schema_register_override_and_predicate():
    p = SchemaPolicy()
    p.register("body", FieldDef(Role.KEYWORD))
    assert p.resolve("body").role is Role.KEYWORD
    p.register(lambda n: n.endswith("_kw"), FieldDef(Role.KEYWORD))
    assert p.resolve("anything_kw").role is Role.KEYWORD


def test_schema_to_index_config():
    p = SchemaPolicy()
    p.register_drilldown("category", hierarchical=True)
    cfg = p.to_index_config(["__id__", "content", "untokenized.lang", "category"])
    assert cfg.text_col == "content"
    assert cfg.id_col == "__id__"
    assert set(cfg.stored_cols) == {"untokenized.lang", "category"}


def test_facet_path():
    assert facet_path("a>b>c") == ["a", "b", "c"]
    long = "x" * 300
    assert facet_path(long) == ["x" * 256]


# ---- TermNumerator ----------------------------------------------------------

def test_term_numerator(tmp_path):
    from meresco_lucene_ray.state import TermNumerator

    tn = TermNumerator(["a", "b"])
    assert tn.numerate("a") == 0
    assert tn.numerate("c") == 2  # append-only upsert
    assert tn.numerate_array(["b", "zz", "c"]).tolist() == [1, -1, 2]
    path = str(tmp_path / "dict.parquet")
    tn.save(path)
    tn2 = TermNumerator.load(path)
    assert tn2.terms == ["a", "b", "c"]


def test_numerate_columns_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from meresco_lucene_ray.state import TermNumerator, numerate_columns

    tn = TermNumerator(["7", "a", "b"])
    ds = rd.from_arrow(
        pa.table({"k": ["b", "zz", None, "a"], "n": [7, 8, 7, None]})
    )
    out = numerate_columns(ds, ["k", "n"], tn).to_pandas().fillna(-1)
    # unseen ('zz', 8) and null values both numerate to -1; the int column
    # numerates through its string form (KeyField values arrive as strings)
    assert out["k_key"].tolist() == [2, -1, -1, 1]
    assert out["n_key"].tolist() == [0, -1, 0, -1]


def test_numerate_columns_str_parity(ray_session):
    """The distributed stage stringifies exactly like the dictionary
    builders' str(v): floats keep their '.0', bools are 'True'/'False',
    nulls are the literal 'None' — so a dictionary built via str() on the
    driver (from_datasets/numerate) resolves identically in the stage."""
    import pyarrow as pa
    import ray.data as rd

    from meresco_lucene_ray.state import TermNumerator, numerate_columns

    tn = TermNumerator(["7.0", "True", "None", "x"])
    ds = rd.from_arrow(
        pa.table(
            {
                "f": pa.array([7.0, 8.5, None], type=pa.float64()),
                "b": pa.array([True, False, None], type=pa.bool_()),
                "s": pa.array(["x", None, "y"], type=pa.string()),
            }
        )
    )
    out = numerate_columns(ds, ["f", "b", "s"], tn).to_pandas()
    assert out["f_key"].tolist() == [0, -1, 2]  # str(7.0)='7.0'; null→'None'
    assert out["b_key"].tolist() == [1, -1, 2]  # str(True)='True'
    assert out["s_key"].tolist() == [3, 2, -1]  # null string → 'None' too
    # parity with the driver-side numerate_array on the same values
    assert tn.numerate_array([7.0, 8.5, None]).tolist() == [0, -1, 2]
