"""Mirrors /root/reference/test/documentutiltest.py (DocumentUtil hierarchy
field emission) and /root/reference/test/delegatinganalyzertest.py (the
position-increment-gap analyzer wrapper), over this engine's wire-field
dicts and tokenizer callables."""

from meresco_lucene_ray.analysis import DelegatingAnalyzer, make_tokenizer, tokenize
from meresco_lucene_ray.docwire import add_string_fields, add_text_fields

PREFIXES = ("base", "middle", "top")


def names(fields):
    return [f["name"] for f in fields]


def test_add_string_field():  # testAddStringField
    fields = []
    add_string_fields(fields, PREFIXES, 2, ".tag", "analyse value")
    assert names(fields) == ["base.tag", "middle.tag", "top.tag"]
    # StringField: untokenized, value stays whole
    assert [f["value"] for f in fields] == ["analyse value"] * 3
    assert all(f["type"] == "StringField" for f in fields)


def test_add_string_field_partly():  # testAddStringFieldPartly
    fields = []
    add_string_fields(fields, PREFIXES, 1, ".tag", "analyse value")
    assert names(fields) == ["base.tag", "middle.tag"]
    assert not fields[0].get("stored", False)


def test_add_string_field_store():  # testAddStringFieldStore
    fields = []
    add_string_fields(fields, PREFIXES, 0, ".tag", "analyse value", store=True)
    assert names(fields) == ["base.tag"]
    assert fields[0]["stored"] is True


def test_add_string_field_facets():  # testAddStringFieldFacets
    fields = []
    add_string_fields(fields, PREFIXES, 0, ".tag", "analyse value", facets=True)
    assert names(fields) == ["base.tag", "base.tag.facet"]
    facet = fields[1]
    assert facet["type"] == "FacetField"
    assert facet["path"] == ["analyse value"]


def test_add_string_field_facets_empty_prefix_skipped():  # !prefixes[j].isEmpty()
    fields = []
    add_string_fields(fields, ("",), 0, "tag", "v", facets=True)
    assert names(fields) == ["tag"]  # no facet for the empty prefix


def test_add_text_field():  # testAddTextField
    fields = []
    add_text_fields(fields, PREFIXES, 2, ".tag", "analyse value")
    assert names(fields) == ["base.tag", "middle.tag", "top.tag"]
    assert all(f["type"] == "TextField" for f in fields)
    # analyzed: the engine tokenizer splits the value
    assert tokenize(fields[0]["value"]) == ["analyse", "value"]
    assert fields[0]["positionIncrementGap"] == 10


def test_add_text_field_store():  # testAddTextFieldStore
    fields = []
    add_text_fields(fields, PREFIXES, 0, ".tag", "analyse value", store=True)
    assert names(fields) == ["base.tag"]
    assert fields[0]["stored"] is True


def test_add_text_field_facets_top_field_only():  # testAddTextFieldFacetsTopFieldOnly
    fields = []
    add_text_fields(fields, PREFIXES, 2, ".tag", "analyse value", facets=True)
    assert names(fields) == ["base.tag", "middle.tag", "top.tag", "top.tag.facet"]
    facet = fields[-1]
    assert facet["type"] == "FacetField"
    assert facet["path"] == ["analyse value"]


def test_delegating_analyzer():  # delegatinganalyzertest.test_analyzer
    delegate = make_tokenizer("standard")
    a = DelegatingAnalyzer(delegate, 10)
    assert a.get_position_increment_gap("field1") == 10
    assert a.get_wrapped_analyzer("field1") is delegate
    assert a(["Hello World"]) == [["hello", "world"]]


def test_delegating_analyzer_gap_positions():
    a = DelegatingAnalyzer(make_tokenizer("standard"), 10)
    pos = a.token_positions(["one two", "two three"])
    # second value restarts 10 past the first value's end
    assert pos == {"one": [0], "two": [1, 12], "three": [13]}
    # a phrase can never span the value boundary: no adjacent cross-value pair
    assert pos["two"][0] + 1 != pos["three"][0] or pos["two"][1] + 1 == pos["three"][0]
