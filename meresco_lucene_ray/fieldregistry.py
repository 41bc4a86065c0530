"""Wire-format field registry — the reference's dynamic field-type system.

Behavior-parity re-expression of
``/root/reference/meresco/lucene/fieldregistry.py:31-260`` (``FieldRegistry``
+ the ``_FieldDefinition`` catalog).  The DICT SHAPES produced here are the
reference's update-protocol wire format — ``DocumentStringToDocument.java:
61-158`` consumes exactly these ``{"type": ..., "name": ..., "value": ...}``
dicts — so the type strings, keys, prefixes and JAVA_* sort sentinels match
the protocol verbatim; the resolution machinery is re-expressed (frozen
dataclass definitions, ordered prefix table, no mutation-memo).

The higher-level :class:`~meresco_lucene_ray.schema.SchemaPolicy` remains
the engine-native schema surface (column roles → IndexConfig); this module
is the *protocol* surface a reference client speaks.  Exercised by
``tests/test_fieldregistry.py`` mirroring
``/root/reference/test/fieldregistrytest.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable

__all__ = [
    "FieldRegistry",
    "FieldDefinition",
    "DrilldownField",
    "IDFIELD",
    "SORTED_PREFIX",
    "UNTOKENIZED_PREFIX",
    "KEY_PREFIX",
    "NUMERIC_PREFIX",
    "RANGE_DOUBLE_PREFIX",
    "RANGE_INT_PREFIX",
    "JAVA_MAX_INT",
    "JAVA_MIN_INT",
    "JAVA_MAX_LONG",
    "JAVA_MIN_LONG",
    "STRINGFIELD",
    "STRINGFIELD_STORED",
    "TEXTFIELD",
    "NO_TERMS_FREQUENCY_FIELD",
    "INTFIELD",
    "INTFIELD_STORED",
    "INTPOINT",
    "LONGFIELD",
    "LONGFIELD_STORED",
    "LONGPOINT",
    "DOUBLEFIELD",
    "DOUBLEFIELD_STORED",
    "DOUBLEPOINT",
    "NUMERICFIELD",
    "KEYFIELD",
    "LATLONFIELD",
]

# protocol constants (fieldregistry.py:31-37)
IDFIELD = "__id__"
SORTED_PREFIX = "sorted."
UNTOKENIZED_PREFIX = "untokenized."
KEY_PREFIX = "__key__."
NUMERIC_PREFIX = "__numeric__."
RANGE_DOUBLE_PREFIX = "range.double."
RANGE_INT_PREFIX = "range.int."

JAVA_MAX_INT, JAVA_MIN_INT = 2**31 - 1, -(2**31)
JAVA_MAX_LONG, JAVA_MIN_LONG = 2**63 - 1, -(2**63)

_STRING_SORT = ("STRING_LAST", "STRING_FIRST")  # (ascending, descending)


@dataclass(frozen=True)
class FieldDefinition:
    """One row of the type catalog (fieldregistry.py:142-157).  ``wire``
    renders the protocol dict (``_FieldDefinition.createField``)."""

    type: str
    python_type: type | None = str
    query_type: str = "String"
    untokenized: bool = False
    phrase_query_possible: bool = False
    stored: bool = False
    # (missing value when ascending, when descending) — Lucene sort sentinels
    missing_values_for_sort: tuple = (None, None)

    def clone(self, **kw: Any) -> "FieldDefinition":
        # accept the reference's camelCase kwarg too (INTFIELD.clone(
        # missingValuesForSort=...), fieldregistrytest.py:244)
        if "missingValuesForSort" in kw:
            kw["missing_values_for_sort"] = kw.pop("missingValuesForSort")
        return replace(self, **kw)

    def wire(self, name: str, value: Any, term_vectors: bool = False) -> dict:
        v = value if self.python_type is None else self.python_type(value)
        d: dict[str, Any] = {"type": self.type, "name": name, "value": v}
        if term_vectors:
            d["termVectors"] = True
        if name.startswith(SORTED_PREFIX):
            d["sort"] = True
        if self.stored:
            d["stored"] = True
        return d


STRINGFIELD = FieldDefinition(
    "StringField", untokenized=True, phrase_query_possible=True,
    missing_values_for_sort=_STRING_SORT,
)
STRINGFIELD_STORED = STRINGFIELD.clone(stored=True)
TEXTFIELD = FieldDefinition(
    "TextField", phrase_query_possible=True, missing_values_for_sort=_STRING_SORT
)
NO_TERMS_FREQUENCY_FIELD = FieldDefinition(
    "NoTermsFrequencyField", missing_values_for_sort=_STRING_SORT
)
INTFIELD = FieldDefinition(
    "IntField", python_type=int, query_type="Int",
    missing_values_for_sort=(JAVA_MAX_INT, JAVA_MIN_INT),
)
INTFIELD_STORED = INTFIELD.clone(stored=True)
INTPOINT = INTFIELD.clone(type="IntPoint")
LONGFIELD = FieldDefinition(
    "LongField", python_type=int, query_type="Long",
    missing_values_for_sort=(JAVA_MAX_LONG, JAVA_MIN_LONG),
)
LONGFIELD_STORED = LONGFIELD.clone(stored=True)
LONGPOINT = LONGFIELD.clone(type="LongPoint")
DOUBLEFIELD = FieldDefinition("DoubleField", python_type=float, query_type="Double")
DOUBLEFIELD_STORED = DOUBLEFIELD.clone(stored=True)
DOUBLEPOINT = DOUBLEFIELD.clone(type="DoublePoint")
NUMERICFIELD = FieldDefinition("NumericField", python_type=int)
KEYFIELD = FieldDefinition("KeyField", python_type=None, untokenized=True)
LATLONFIELD = FieldDefinition(
    "LatLonField", python_type=list, query_type="Distance", untokenized=True
)

# prefix → definition, checked in order after exact registrations
_PREFIX_RULES: tuple[tuple[str, FieldDefinition], ...] = (
    (SORTED_PREFIX, STRINGFIELD),
    (UNTOKENIZED_PREFIX, STRINGFIELD),
    (KEY_PREFIX, KEYFIELD),
    (NUMERIC_PREFIX, NUMERICFIELD),
    (RANGE_DOUBLE_PREFIX, DOUBLEFIELD),
    (RANGE_INT_PREFIX, INTFIELD),
)


@dataclass(frozen=True)
class DrilldownField:
    """Drilldown registration record (meresco/lucene/__init__.py analog)."""

    name: str
    hierarchical: bool = False
    multi_valued: bool = True
    index_field_name: str | None = None


class FieldRegistry:
    """Per-field-name schema resolver producing wire field dicts
    (fieldregistry.py:40-136)."""

    def __init__(
        self,
        drilldown_fields: list[DrilldownField] | None = None,
        default_definition: FieldDefinition | None = None,
        term_vector_fields: list[str] | None = None,
        is_drilldown_field_function: Callable[[str], bool] | None = None,
    ) -> None:
        self._exact: dict[str, FieldDefinition] = {IDFIELD: STRINGFIELD_STORED}
        self._by_predicate: list[tuple[Callable[[str], bool], FieldDefinition]] = []
        self._default = default_definition or TEXTFIELD
        self._term_vector_fields = frozenset(term_vector_fields or ())
        self.drilldown_field_names: dict[str, dict] = {}
        for f in drilldown_fields or []:
            self.register_drilldown_field(
                f.name, hierarchical=f.hierarchical, multi_valued=f.multi_valued,
                index_field_name=f.index_field_name,
            )
        self._is_drilldown_fn = is_drilldown_field_function

    # ---- registration ---------------------------------------------------
    def register(self, fieldname_or_predicate, field_definition: FieldDefinition):
        if callable(fieldname_or_predicate):
            self._by_predicate.append((fieldname_or_predicate, field_definition))
        else:
            self._exact[fieldname_or_predicate] = field_definition

    def register_drilldown_field(
        self, fieldname: str, hierarchical: bool = False, multi_valued: bool = True,
        index_field_name: str | None = None,
    ) -> None:
        self.drilldown_field_names[fieldname] = dict(
            hierarchical=hierarchical, multiValued=multi_valued,
            indexFieldName=index_field_name,
        )

    # ---- wire field construction ---------------------------------------
    def create_field(self, fieldname: str, value: Any) -> dict:
        return self._definition(fieldname).wire(
            fieldname, value, fieldname in self._term_vector_fields
        )

    def create_facet_field(self, fieldname: str, path: list[str]) -> dict:
        return {"type": "FacetField", "name": fieldname, "path": path}

    def create_id_field(self, value: str) -> dict:
        return self.create_field(IDFIELD, value)

    # ---- schema predicates ----------------------------------------------
    def is_drilldown_field(self, fieldname: str) -> bool:
        if self._is_drilldown_fn is not None:
            return self._is_drilldown_fn(fieldname)
        return fieldname in self.drilldown_field_names

    def is_hierarchical_drilldown(self, fieldname: str):
        return self.drilldown_field_names.get(fieldname, {}).get("hierarchical")

    def is_multivalued_drilldown(self, fieldname: str):
        return self.drilldown_field_names.get(fieldname, {}).get("multiValued")

    def is_term_vector_field(self, fieldname: str) -> bool:
        return fieldname in self._term_vector_fields

    def is_index_field(self, fieldname: str) -> bool:
        # a pure drilldown field lives only in the taxonomy — unless it also
        # carries term vectors (fieldregistry.py:97-98)
        return not self.is_drilldown_field(fieldname) or self.is_term_vector_field(
            fieldname
        )

    def is_untokenized(self, fieldname: str) -> bool:
        return self.is_drilldown_field(fieldname) or self._definition(
            fieldname
        ).untokenized

    def is_numeric(self, fieldname: str) -> bool:
        return self._definition(fieldname).python_type in (int, float)

    def phrase_query_possible(self, fieldname: str) -> bool:
        return self._definition(fieldname).phrase_query_possible

    # ---- sort / range typing --------------------------------------------
    def range_query_and_type(self, fieldname: str) -> tuple[str, type | None]:
        d = self._definition(fieldname)
        return d.query_type, d.python_type

    def sort_field_type(self, fieldname: str) -> str:
        return self._definition(fieldname).query_type

    get_query_type = sort_field_type

    def default_missing_value_for_sort(self, fieldname: str, sort_descending: bool):
        if fieldname == "score":
            return None
        pair = self._definition(fieldname).missing_values_for_sort
        return pair[1] if sort_descending else pair[0]

    # ---- resolution ------------------------------------------------------
    def _definition(self, fieldname: str) -> FieldDefinition:
        for pred, d in self._by_predicate:
            if pred(fieldname):
                return d
        if fieldname in self._exact:
            return self._exact[fieldname]
        for prefix, d in _PREFIX_RULES:
            if fieldname.startswith(prefix):
                return d
        return self._default
