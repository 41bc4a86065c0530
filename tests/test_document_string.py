"""Mirrors /root/reference/test/org/meresco/lucene/DocumentStringToDocumentTest.java
— the server-side wire-document JSON parse into typed indexable fields,
including the exact Lucene numeric/geo encodings."""

import json

from meresco_lucene_ray.docwire import (
    decode_latitude,
    decode_longitude,
    document_string_to_fields,
    double_to_sortable_long,
    encode_latitude,
    encode_longitude,
)
from meresco_lucene_ray.state.numerate import TermNumerator


def conv(fields, **kw):
    return document_string_to_fields(json.dumps(fields), **kw)


def one(fields, **kw):
    (f,) = conv(fields, **kw)
    return f


def test_string_field():  # testStringField
    f = one([{"type": "StringField", "name": "name", "value": "value"}])
    assert (f["index"], f["stored"], f["value"]) == ("string", False, "value")


def test_sorted_string_field():  # testStringFieldsSorted
    f = one([{"type": "StringField", "name": "name", "value": "value", "sort": True}])
    assert f["docvalues"] == "sorted"
    assert f["index"] is None
    assert f["value"] == "value"


def test_string_field_stored():  # testStringFieldStored
    f = one([{"type": "StringField", "name": "name", "value": "value", "stored": True}])
    assert (f["index"], f["stored"]) == ("string", True)


def test_text_field():  # testTextField
    f = one([{"type": "TextField", "name": "name", "value": "value"}])
    assert (f["index"], f["term_vectors"]) == ("text", False)


def test_text_field_with_term_vectors():  # testTextFieldWithTermVectors
    f = one([{"type": "TextField", "termVectors": True, "name": "name", "value": "value"}])
    assert (f["index"], f["term_vectors"]) == ("text", True)


def test_no_terms_frequency_field():  # testNoTermsFrequencyField
    f = one([{"type": "NoTermsFrequencyField", "name": "name", "value": "value"}])
    assert f["index"] == "no_terms_frequency"


def test_int_field():  # testIntField (+ IntPoint alias)
    for t in ("IntField", "IntPoint"):
        f = one([{"type": t, "name": "name", "value": 1}])
        assert (f["index"], f["value"]) == ("point", 1)


def test_sorted_int_field():  # testSortedIntField
    f = one([{"type": "IntField", "name": "name", "value": 1, "sort": True}])
    assert (f["docvalues"], f["value"]) == ("numeric", 1)


def test_stored_int_field():  # testStoredIntField — TWO fields
    fs = conv([{"type": "IntField", "name": "name", "value": 1, "stored": True}])
    assert [(f["stored"], f["index"]) for f in fs] == [(True, None), (False, "point")]
    assert all(f["value"] == 1 for f in fs)


def test_long_field():  # testLongField / testSortedLongField / testStoredLongField
    f = one([{"type": "LongField", "name": "name", "value": 1}])
    assert (f["index"], f["value"]) == ("point", 1)
    f = one([{"type": "LongField", "name": "name", "value": 1, "sort": True}])
    assert (f["docvalues"], f["value"]) == ("numeric", 1)
    fs = conv([{"type": "LongField", "name": "name", "value": 1, "stored": True}])
    assert fs[0]["stored"] is True


def test_double_field():  # testDoubleField / testStoredDoubleField
    f = one([{"type": "DoubleField", "name": "name", "value": 1.5}])
    assert (f["index"], f["value"]) == ("point", 1.5)
    fs = conv([{"type": "DoubleField", "name": "name", "value": 1.1, "stored": True}])
    assert (fs[0]["stored"], fs[0]["value"]) == (True, 1.1)


def test_sorted_double_field():  # testSortedDoubleField — sortable-long bits
    f = one([{"type": "DoubleField", "name": "name", "value": 1.5, "sort": True}])
    assert (f["docvalues"], f["value"]) == ("numeric", double_to_sortable_long(1.5))
    assert f["value"] == 4609434218613702656  # NumericUtils.doubleToSortableLong(1.5)


def test_numeric_field():  # testNumericField
    f = one([{"type": "NumericField", "name": "name", "value": 1}])
    assert (f["docvalues"], f["value"]) == ("numeric", 1)


def test_numerate_key_fields():  # testNumerateKeyField (mock ord=42 → 43, 153 passthrough)
    class MockNumerator(TermNumerator):
        def __init__(self):
            super().__init__()
            self.ord = 42

        def numerate(self, value):
            self.ord += 1
            return self.ord

    fs = conv(
        [
            {"type": "KeyField", "name": "name", "value": "a string"},
            {"type": "KeyField", "name": "name2", "value": 153},
        ],
        term_numerator=MockNumerator(),
    )
    assert [(f["name"], f["docvalues"], f["value"]) for f in fs] == [
        ("name", "numeric", 43),
        ("name2", "numeric", 153),
    ]


def test_facet_field():  # testFacetField
    f = one([{"type": "FacetField", "name": "name", "path": ["path", "sub"]}])
    assert f["path"] == ["path", "sub"]
    assert f.get("facet") is True


def test_lat_lon_field():  # testLatLonField — exact LatLonPoint quantization
    f = one([{"type": "LatLonField", "name": "name", "value": [52.03333, 5.65833]}])
    lat, lon = f["value"]
    assert repr(lat) == "52.03332996927202"
    assert repr(lon) == "5.658329967409372"


def test_geo_encoding_roundtrip_monotone():
    for v in (-90.0, -45.5, 0.0, 0.1, 89.999):
        assert abs(decode_latitude(encode_latitude(v)) - v) < 1e-7
    for v in (-180.0, -5.0, 0.0, 179.999):
        assert abs(decode_longitude(encode_longitude(v)) - v) < 1e-6


def test_double_to_sortable_long_order():
    vals = [-2.5, -1.0, -0.0, 0.0, 0.5, 1.5, 3e9]
    enc = [double_to_sortable_long(v) for v in vals]
    assert enc == sorted(enc)
