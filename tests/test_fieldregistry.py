"""Mirrors /root/reference/test/fieldregistrytest.py — the wire-format field
registry (every case, snake_case API)."""

from meresco_lucene_ray.fieldregistry import (
    DOUBLEFIELD,
    INTFIELD,
    JAVA_MAX_INT,
    JAVA_MAX_LONG,
    JAVA_MIN_INT,
    JAVA_MIN_LONG,
    LATLONFIELD,
    LONGFIELD,
    NO_TERMS_FREQUENCY_FIELD,
    NUMERICFIELD,
    STRINGFIELD,
    STRINGFIELD_STORED,
    TEXTFIELD,
    DrilldownField,
    FieldRegistry,
)


def test_default():  # testDefault
    registry = FieldRegistry()
    assert registry.create_field("__id__", "id:1") == {
        "type": "StringField", "name": "__id__", "value": "id:1", "stored": True,
    }


def test_specific_field():  # testSpecificField
    registry = FieldRegistry()
    assert registry.create_field("fieldname", "value") == {
        "type": "TextField", "name": "fieldname", "value": "value",
    }
    registry.register("fieldname", STRINGFIELD_STORED)
    assert registry.create_field("fieldname", "value") == {
        "type": "StringField", "name": "fieldname", "value": "value", "stored": True,
    }


def test_no_terms_freq_field():  # testNoTermsFreqField
    registry = FieldRegistry()
    registry.register("fieldname", NO_TERMS_FREQUENCY_FIELD)
    assert registry.create_field("fieldname", "value") == {
        "type": "NoTermsFrequencyField", "name": "fieldname", "value": "value",
    }


def test_numeric_field():  # testNumericField
    registry = FieldRegistry()
    registry.register("fieldname", NUMERICFIELD)
    assert registry.create_field("fieldname", 2010) == {
        "type": "NumericField", "name": "fieldname", "value": 2010,
    }


def test_phrase_query_possible():  # testPhraseQueryPossible
    registry = FieldRegistry()
    registry.register("fieldname", NO_TERMS_FREQUENCY_FIELD)
    assert not registry.phrase_query_possible("fieldname")
    assert registry.phrase_query_possible("other.fieldname")


def test_is_untokenized():  # testIsUntokenized
    registry = FieldRegistry(drilldown_fields=[DrilldownField("aDrilldownField")])
    assert registry.is_untokenized("aDrilldownField")
    assert registry.is_untokenized("untokenized.some.field")
    assert not registry.is_untokenized("other.field")
    registry.register("fieldname", STRINGFIELD)
    assert registry.is_untokenized("fieldname")
    registry.register("fieldname", TEXTFIELD)
    assert not registry.is_untokenized("fieldname")


def test_drilldown_fields():  # testDrilldownFields
    registry = FieldRegistry(
        drilldown_fields=[
            DrilldownField(name="aap"),
            DrilldownField(name="noot", hierarchical=True),
        ]
    )
    registry.register_drilldown_field(fieldname="mies", multi_valued=False)
    assert registry.is_drilldown_field("aap")
    assert registry.is_drilldown_field("noot")
    assert registry.is_drilldown_field("mies")
    assert not registry.is_drilldown_field("vuur")
    assert not registry.is_hierarchical_drilldown("aap")
    assert registry.is_hierarchical_drilldown("noot")
    assert registry.is_multivalued_drilldown("aap")
    assert registry.is_multivalued_drilldown("noot")
    assert not registry.is_multivalued_drilldown("mies")
    assert registry.is_untokenized("mies")
    assert registry.create_facet_field("name", ["value"]) == {
        "type": "FacetField", "name": "name", "path": ["value"],
    }


def test_is_drilldown_field_fn():  # testIsDrilldownFieldFn
    registry = FieldRegistry(is_drilldown_field_function=lambda name: "drill" in name)
    assert not registry.is_drilldown_field("vuur")
    assert registry.is_drilldown_field("vuur.drill.")


def test_generic_drilldown_fields():  # testGenericDrilldownFields
    registry = FieldRegistry(
        is_drilldown_field_function=lambda name: name.startswith("drilldown")
    )
    assert registry.is_drilldown_field("drilldown.aap")
    assert registry.is_drilldown_field("drilldown.noot")
    assert not registry.is_drilldown_field("noot")


def test_default_definition():  # testDefaultDefinition
    registry = FieldRegistry()
    assert registry.create_field("aField", "id:1") == {
        "type": "TextField", "name": "aField", "value": "id:1",
    }
    assert not registry.is_untokenized("aField")
    registry = FieldRegistry(default_definition=STRINGFIELD)
    assert registry.create_field("aField", "id:1") == {
        "type": "StringField", "name": "aField", "value": "id:1",
    }
    assert registry.is_untokenized("aField")


def test_term_vectors_for_field():  # testTermVectorsForField
    registry = FieldRegistry(term_vector_fields=["field1", "field2"])
    assert registry.is_term_vector_field("field1")
    assert registry.is_term_vector_field("field2")
    assert not registry.is_term_vector_field("field3")
    assert registry.create_field("field1", "id:1") == {
        "type": "TextField", "name": "field1", "value": "id:1", "termVectors": True,
    }
    assert registry.create_field("field3", "id:1") == {
        "type": "TextField", "name": "field3", "value": "id:1",
    }


def test_is_index_field():  # testIsIndexField
    registry = FieldRegistry(
        drilldown_fields=[DrilldownField(f) for f in ["field2", "field3"]],
        term_vector_fields=["field1", "field2"],
    )
    assert registry.is_index_field("field1")
    assert registry.is_index_field("field2")  # drilldown + term vectors
    assert not registry.is_index_field("field3")  # pure drilldown
    assert registry.is_index_field("field4")


def test_is_numeric():  # testIsNumeric
    registry = FieldRegistry()
    registry.register("longfield", LONGFIELD)
    registry.register("intfield", INTFIELD)
    assert not registry.is_numeric("field1")
    assert registry.is_numeric("longfield")
    assert registry.is_numeric("intfield")
    assert registry.is_numeric("range.double.afield")
    assert not registry.is_numeric("__key__.field1")


def test_range_query_and_type():  # testRangeQueryAndType
    registry = FieldRegistry()
    registry.register("longfield", LONGFIELD)
    registry.register("intfield", INTFIELD)
    assert registry.range_query_and_type("longfield") == ("Long", int)
    assert registry.range_query_and_type("intfield") == ("Int", int)
    assert registry.range_query_and_type("range.double.field") == ("Double", float)
    assert registry.range_query_and_type("anyfield") == ("String", str)


def test_sort_field():  # testSortField
    registry = FieldRegistry()
    registry.register("sorted.longfield", LONGFIELD)
    registry.register("sorted.intfield", INTFIELD)
    registry.register("sorted.stringfield", STRINGFIELD)

    assert registry.sort_field_type("sorted.longfield") == "Long"
    assert registry.default_missing_value_for_sort("sorted.longfield", True) == JAVA_MIN_LONG
    assert registry.default_missing_value_for_sort("sorted.longfield", False) == JAVA_MAX_LONG

    assert registry.sort_field_type("sorted.intfield") == "Int"
    assert registry.default_missing_value_for_sort("sorted.intfield", True) == JAVA_MIN_INT
    assert registry.default_missing_value_for_sort("sorted.intfield", False) == JAVA_MAX_INT

    assert registry.sort_field_type("sorted.stringfield") == "String"
    assert registry.default_missing_value_for_sort("sorted.stringfield", True) == "STRING_FIRST"
    assert registry.default_missing_value_for_sort("sorted.stringfield", False) == "STRING_LAST"

    assert registry.default_missing_value_for_sort("score", False) is None

    assert registry.create_field("sorted.longfield", "1") == {
        "name": "sorted.longfield", "type": "LongField", "value": 1, "sort": True,
    }


def test_sort_field_after_clone_of_type():  # testSortFieldAfterCloneOfType
    my_int_field = INTFIELD.clone(missingValuesForSort=(0, 0))
    registry = FieldRegistry()
    registry.register("standard.intfield", INTFIELD)
    registry.register("my.intfield", my_int_field)

    assert registry.default_missing_value_for_sort("standard.intfield", True) == JAVA_MIN_INT
    assert registry.default_missing_value_for_sort("standard.intfield", False) == JAVA_MAX_INT
    assert registry.default_missing_value_for_sort("my.intfield", True) == 0
    assert registry.default_missing_value_for_sort("my.intfield", False) == 0
    assert registry.sort_field_type("standard.intfield") == "Int"
    assert registry.sort_field_type("my.intfield") == "Int"


def test_latlon_field():  # testLatLonField
    registry = FieldRegistry()
    registry.register("latlon", LATLONFIELD)
    assert registry.create_field("latlon", (52.03333, 5.65833)) == {
        "name": "latlon", "type": "LatLonField", "value": [52.03333, 5.65833],
    }


def test_double_field_registered():
    registry = FieldRegistry()
    registry.register("d", DOUBLEFIELD)
    assert registry.create_field("d", "2.5") == {
        "type": "DoubleField", "name": "d", "value": 2.5,
    }
