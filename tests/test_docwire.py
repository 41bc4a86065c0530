"""Mirrors /root/reference/test/fields2lucenedoctest.py and
fieldslisttolucenedocumenttest.py — wire-document assembly — plus the
columnar bridge (doc_to_row → build_index ingest shape)."""

import pytest

from meresco_lucene_ray.docwire import Fields2Doc, FieldsListToDoc, doc_to_row
from meresco_lucene_ray.fieldregistry import DrilldownField, FieldRegistry

LONG_SPECIAL = (
    "Министерство "
    "Рыбной Пром"
)


def test_create_document():  # testCreateDocument
    fields = {
        "field1": ["value1"],
        "field2": ["value2", "value2.1"],
        "sorted.field3": ["value3"],
        "untokenized.field4": ["value4"],
        "__key__.field5": [12345],
        "__numeric__.field6": [12345],
    }
    f2d = Fields2Doc(field_registry=FieldRegistry())
    created = f2d.create_fields(fields)
    assert sorted(created, key=lambda d: (d["name"], str(d["value"]))) == [
        {"name": "__key__.field5", "type": "KeyField", "value": 12345},
        {"name": "__numeric__.field6", "type": "NumericField", "value": 12345},
        {"name": "field1", "type": "TextField", "value": "value1"},
        {"name": "field2", "type": "TextField", "value": "value2"},
        {"name": "field2", "type": "TextField", "value": "value2.1"},
        {"name": "sorted.field3", "type": "StringField", "value": "value3", "sort": True},
        {"name": "untokenized.field4", "type": "StringField", "value": "value4"},
    ]


def test_create_facet():  # testCreateFacet
    f2d = Fields2Doc(
        field_registry=FieldRegistry(
            drilldown_fields=[
                DrilldownField("untokenized.field4"),
                DrilldownField("untokenized.field5"),
                DrilldownField("untokenized.field6"),
                DrilldownField("untokenized.field8", hierarchical=True),
            ]
        )
    )
    for name, values in {
        "field1": ["value1"],
        "sorted.field3": ["value3"],
        "untokenized.field4": ["value4"],
        "untokenized.field5": ["value5", "value6"],
        "untokenized.field6": ["value5/value6"],
        "untokenized.field7": ["valuex"],
        "untokenized.field8": [
            ["grandparent", "parent", "child"], ["parent2", "child"],
        ],
    }.items():
        for value in values:
            f2d.add_field(name, value)
    identifier, fields = f2d.commit("identifier")
    assert identifier == "identifier"

    search_fields = [f for f in fields if "path" not in f]
    assert [f["name"] for f in search_fields] == [
        "field1", "sorted.field3", "untokenized.field7",
    ]
    facet_fields = [(f["name"], f["path"]) for f in fields if "path" in f]
    assert facet_fields == [
        ("untokenized.field4", ["value4"]),
        ("untokenized.field5", ["value5"]),
        ("untokenized.field5", ["value6"]),
        ("untokenized.field6", ["value5/value6"]),
        ("untokenized.field8", ["grandparent", "parent", "child"]),
        ("untokenized.field8", ["parent2", "child"]),
    ]


def test_add_facet_field():  # testAddFacetField
    f2d = Fields2Doc(
        field_registry=FieldRegistry(
            drilldown_fields=[DrilldownField("untokenized.field")]
        )
    )
    f2d.add_field("field", "value")
    f2d.add_facet_field("untokenized.field", "untokenized value")
    _, fields = f2d.commit("identifier")
    assert len([f for f in fields if "path" in f]) == 1


def test_only_one_sort_value_allowed():  # testOnlyOneSortValueAllowed
    f2d = Fields2Doc(field_registry=FieldRegistry())
    f2d.add_field("sorted.field", "value1")
    f2d.add_field("sorted.field", "value2")
    _, fields = f2d.commit("identifier")
    assert fields == [
        {"sort": True, "type": "StringField", "name": "sorted.field", "value": "value1"}
    ]


def test_empty_commit_and_identifier_rewrite():  # testAddDocument+testRewriteIdentifier
    f2d = Fields2Doc(
        field_registry=FieldRegistry(),
        identifier_rewrite=lambda i: "test:" + i,
    )
    assert f2d.commit("identifier") is None  # nothing accumulated
    f2d.add_field("field", "value")
    identifier, fields = f2d.commit("identifier")
    assert identifier == "test:identifier"
    assert len(fields) == 1
    # the accumulator drains per commit
    assert f2d.commit("identifier") is None


def test_protected_id_field():
    f2d = Fields2Doc(field_registry=FieldRegistry())
    f2d.add_field("__id__", "explicit")
    with pytest.raises(ValueError, match="protected"):
        f2d.commit("identifier")


def test_rewrite_fields():  # testRewriteFields
    def rewrite_fields(fields):
        fields["keys"] = list(sorted(fields.keys()))
        return fields

    f2d = Fields2Doc(field_registry=FieldRegistry(), rewrite_fields=rewrite_fields)
    f2d.add_field("field1", "value1")
    f2d.add_field("field2", "value2")
    _, fields = f2d.commit("identifier")
    assert {f["name"] for f in fields} == {"field1", "field2", "keys"}
    assert [f["value"] for f in fields if f["name"] == "keys"] == ["field1", "field2"]


def test_fields_list_add():  # fieldslisttolucenedocumenttest.testAdd
    class Factory:
        def __init__(self, observable, untokenized_fieldnames):
            self.observable = observable
            self.untokenized_fieldnames = untokenized_fieldnames

        def fields_for(self, fieldname, value):
            return [(fieldname, value)]

    registry = FieldRegistry(drilldown_fields=[DrilldownField("drilldown.field")])
    conv = FieldsListToDoc(
        registry, untokenized_fieldnames=[], index_field_factory=Factory
    )
    long_value = LONG_SPECIAL * 20  # > 256 chars, multi-byte
    identifier, fields = conv.add(
        identifier="",
        fieldslist=[
            ("field1", "value1"),
            ("field2", "value2"),
            ("drilldown.field", "a drilldown value"),
            ("drilldown.field", long_value),
            ("drilldown.field", ["a", "b"]),
            ("drilldown.field", []),
            ("__key__.field", "a key value"),
            ("__key__.field1", 2),
        ],
    )
    assert identifier == ""
    assert fields == [
        {"name": "field1", "type": "TextField", "value": "value1"},
        {"name": "field2", "type": "TextField", "value": "value2"},
        {"name": "drilldown.field", "type": "FacetField", "path": ["a drilldown value"]},
        {"name": "drilldown.field", "type": "FacetField", "path": [long_value[:256]]},
        {"name": "drilldown.field", "type": "FacetField", "path": ["a", "b"]},
        {"name": "__key__.field", "type": "KeyField", "value": "a key value"},
        {"name": "__key__.field1", "type": "KeyField", "value": 2},
    ]


def test_doc_to_row_bridge():
    registry = FieldRegistry(
        drilldown_fields=[
            DrilldownField("tags"), DrilldownField("facet_path", hierarchical=True),
        ]
    )
    f2d = Fields2Doc(field_registry=registry)
    f2d.add_field("text", "first sentence")
    f2d.add_field("text", "second sentence")
    f2d.add_field("sorted.rank", "3")
    f2d.add_field("tags", "a")
    f2d.add_field("tags", "b")
    f2d.add_field("facet_path", ["first", "second"])
    _, fields = f2d.commit("doc:1")
    row = doc_to_row(fields)
    assert row == {
        "text": "first sentence second sentence",
        "sorted.rank": "3",
        "tags": ["a", "b"],
        "facet_path": ["first", "second"],
    }
