"""Update-protocol document builders — field dicts/lists → wire documents.

Re-expresses the reference's two document-assembly components without the
Observable/Transaction plumbing (plain accumulators returning
``(identifier, fields)`` instead of emitting ``addDocument`` upstream):

- :class:`Fields2Doc` ← ``meresco/lucene/fields2lucenedoc.py:38-94``
  (``Fields2LuceneDoc``): transaction-scoped ``{name: [values]}``
  accumulator; first value wins for ``sorted.*`` fields; drilldown values
  become FacetField paths (a list value IS the path, a scalar a 1-leaf
  path); writing ``__id__`` directly is a protocol error.
- :class:`FieldsListToDoc` ← ``meresco/lucene/fieldslisttolucenedocument.py:
  35-66`` (``FieldsListToLuceneDocument``): ordered ``[(name, value)]``
  lists through an optional per-field factory; empty drilldown paths are
  dropped and facet leaf values truncate at 256 chars
  (MAX_FACET_LEAF_VALUE_LENGTH); drilldown fields that also carry term
  vectors are indexed too (``isIndexField``).

``doc_to_row`` bridges a wire document onto this engine's columnar ingest
(one Arrow row: text fields joined, facet paths as ``list<string>``) so a
reference client's update stream can feed ``build_index`` directly.

Exercised by ``tests/test_docwire.py`` mirroring
``/root/reference/test/fields2lucenedoctest.py`` and
``fieldslisttolucenedocumenttest.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from .fieldregistry import IDFIELD, SORTED_PREFIX, FieldRegistry
from .schema import MAX_FACET_LEAF_VALUE_LENGTH

__all__ = [
    "Fields2Doc",
    "FieldsListToDoc",
    "add_string_fields",
    "add_text_fields",
    "doc_to_row",
    "document_string_to_fields",
    "double_to_sortable_long",
    "decode_latitude",
    "decode_longitude",
    "encode_latitude",
    "encode_longitude",
]

# ---- Lucene numeric/geo encodings (exact ports, pinned by tests) --------

_LATITUDE_DECODE = 90.0 / (1 << 31)
_LONGITUDE_DECODE = 180.0 / (1 << 31)


def double_to_sortable_long(value: float) -> int:
    """NumericUtils.doubleToSortableLong: IEEE-754 bits with the sign-flip
    trick so numeric order == long order."""
    import struct

    bits = struct.unpack("<q", struct.pack("<d", value))[0]
    return bits ^ ((bits >> 63) & 0x7FFFFFFFFFFFFFFF)


def encode_latitude(latitude: float) -> int:
    """GeoEncodingUtils.encodeLatitude — LatLonPoint's int32 quantizer."""
    import math

    return math.floor(latitude / _LATITUDE_DECODE)


def decode_latitude(encoded: int) -> float:
    return encoded * _LATITUDE_DECODE


def encode_longitude(longitude: float) -> int:
    import math

    return math.floor(longitude / _LONGITUDE_DECODE)


def decode_longitude(encoded: int) -> float:
    return encoded * _LONGITUDE_DECODE


def document_string_to_fields(document_string: str, term_numerator=None) -> list[dict]:
    """Wire document JSON → typed indexable-field records — the server-side
    ingest parse (src/org/meresco/lucene/DocumentStringToDocument.java:62-160,
    DocumentStringToDocumentTest.java).

    Each record carries the Lucene-shaped disposition so the columnar ingest
    (and the tests) can see exactly what the reference would have indexed:
    ``index`` (``"string" | "text" | "no_terms_frequency" | "point" | None``),
    ``docvalues`` (``"sorted" | "numeric" | None``), ``stored`` /
    ``term_vectors`` flags and the (typed) ``value``.  Notable semantics:

    - ``StringField`` with ``sort`` becomes ONLY a SortedDocValuesField;
    - stored Int/Long/Double points emit TWO records (StoredField + point),
      matching testStoredIntField's two-field document;
    - sorted doubles carry ``NumericUtils.doubleToSortableLong``;
    - ``KeyField`` string values numerate through ``term_numerator``;
    - ``LatLonField`` values quantize through the LatLonPoint int32 encoding.
    """
    import json as _json

    fields: list[dict] = []

    def rec(name, **kw):
        d = {
            "name": name,
            "index": None,
            "docvalues": None,
            "stored": False,
            "term_vectors": False,
        }
        d.update(kw)
        return d

    for f in _json.loads(document_string):
        name = f["name"]
        ftype = f["type"]
        sort = bool(f.get("sort", False))
        stored = bool(f.get("stored", False))
        tv = bool(f.get("termVectors", False))
        if ftype == "StringField":
            if sort:
                fields.append(rec(name, docvalues="sorted", value=f["value"]))
            else:
                fields.append(
                    rec(name, index="string", stored=stored, term_vectors=tv,
                        value=f["value"])
                )
        elif ftype == "TextField":
            fields.append(
                rec(name, index="text", term_vectors=tv, value=f["value"])
            )
        elif ftype == "NoTermsFrequencyField":
            fields.append(
                rec(name, index="no_terms_frequency", value=f["value"])
            )
        elif ftype in ("IntPoint", "IntField", "LongPoint", "LongField"):
            value = int(f["value"])
            if sort:
                fields.append(rec(name, docvalues="numeric", value=value))
            else:
                if stored:
                    fields.append(rec(name, stored=True, value=value))
                fields.append(rec(name, index="point", value=value))
        elif ftype in ("DoublePoint", "DoubleField"):
            value = float(f["value"])
            if sort:
                fields.append(
                    rec(name, docvalues="numeric",
                        value=double_to_sortable_long(value))
                )
            else:
                if stored:
                    fields.append(rec(name, stored=True, value=value))
                fields.append(rec(name, index="point", value=value))
        elif ftype == "NumericField":
            fields.append(rec(name, docvalues="numeric", value=int(f["value"])))
        elif ftype == "KeyField":
            v = f["value"]
            if isinstance(v, str):
                if term_numerator is None:
                    raise ValueError("KeyField with a string value needs a term_numerator")
                v = term_numerator.numerate(v)
            fields.append(rec(name, docvalues="numeric", value=int(v)))
        elif ftype == "FacetField":
            fields.append(rec(name, facet=True, path=[str(p) for p in f["path"]]))
        elif ftype == "LatLonField":
            lat, lon = f["value"]
            fields.append(
                rec(name, index="point",
                    value=(
                        decode_latitude(encode_latitude(float(lat))),
                        decode_longitude(encode_longitude(float(lon))),
                    ))
            )
        # unknown types are skipped, like the reference's switch default
    return fields


def add_string_fields(
    fields: list[dict],
    prefixes: Iterable[str],
    upto: int,
    tag: str,
    value: str,
    store: bool = False,
    facets: bool = False,
) -> None:
    """DocumentUtil.add_StringFields
    (src/org/meresco/lucene/analysis/DocumentUtil.java:66-74): one
    untokenized StringField per hierarchy prefix ``prefixes[0..upto]`` named
    ``prefix + tag``; with ``facets``, the DEEPEST non-empty prefix also
    emits a ``<fieldname>.facet`` FacetField with the value as a 1-leaf
    path."""
    prefixes = list(prefixes)
    for j in range(upto + 1):
        fieldname = prefixes[j] + tag
        d: dict[str, Any] = {"type": "StringField", "name": fieldname, "value": value}
        if store:
            d["stored"] = True
        fields.append(d)
        if facets and prefixes[j] and j == upto:
            fields.append(
                {"type": "FacetField", "name": fieldname + ".facet", "path": [value]}
            )


def add_text_fields(
    fields: list[dict],
    prefixes: Iterable[str],
    upto: int,
    tag: str,
    value: str,
    store: bool = False,
    position_increment_gap: int = 10,
    facets: bool = False,
) -> None:
    """DocumentUtil.add_TextFields (DocumentUtil.java:75-83): like
    :func:`add_string_fields` but analyzed TextFields.  The reference wraps
    the analyzer per field with a position-increment gap
    (``analysis.DelegatingAnalyzer``); in this engine's columnar ingest the
    gap survives as the multi-value join separator (``doc_to_row`` —
    phrases never span values because the separator tokenizes away)."""
    prefixes = list(prefixes)
    for j in range(upto + 1):
        fieldname = prefixes[j] + tag
        d: dict[str, Any] = {
            "type": "TextField",
            "name": fieldname,
            "value": value,
            "positionIncrementGap": position_increment_gap,
        }
        if store:
            d["stored"] = True
        fields.append(d)
        if facets and prefixes[j] and j == upto:
            fields.append(
                {"type": "FacetField", "name": fieldname + ".facet", "path": [value]}
            )


class Fields2Doc:
    """Accumulate ``add_field`` / ``add_facet_field`` calls, then ``commit``
    into one wire document (fields2lucenedoc.py:38-94)."""

    def __init__(
        self,
        field_registry: FieldRegistry,
        identifier_rewrite: Callable[[str], str] | None = None,
        rewrite_fields: Callable[[dict], dict] | None = None,
    ) -> None:
        self._registry = field_registry
        self._identifier_rewrite = identifier_rewrite or (lambda i: i)
        self._rewrite_fields = rewrite_fields or (lambda f: f)
        self._fields: dict[str, list] = {}
        self._facet_fields: dict[str, list] = {}

    def add_field(self, name: str, value: Any) -> None:
        values = self._fields.setdefault(name, [])
        if name.startswith(SORTED_PREFIX) and values:
            return  # only one sort value allowed (:55-57)
        values.append(value)

    def add_facet_field(self, name: str, value: Any) -> None:
        self._facet_fields.setdefault(name, []).append(value)

    def commit(self, identifier: str) -> tuple[str, list[dict]] | None:
        """Drain the accumulator into ``(identifier, fields)``; None when
        nothing was added (:64-67)."""
        if not (self._fields or self._facet_fields):
            return None
        field_values = self._rewrite_fields(self._fields)
        out = (
            self._identifier_rewrite(identifier),
            self.create_fields(field_values, self._facet_fields),
        )
        self._fields, self._facet_fields = {}, {}
        return out

    def create_fields(
        self, field_values: dict[str, list], facet_fields: dict[str, list] | None = None
    ) -> list[dict]:
        """``_createFields`` (:77-94): every (name, value) pair becomes one
        wire field; drilldown names render FacetField paths instead."""
        fields: list[dict] = []
        for name, values in list(field_values.items()) + list(
            (facet_fields or {}).items()
        ):
            if self._registry.is_drilldown_field(name):
                for value in values:
                    path = (
                        [str(c) for c in value]
                        if isinstance(value, (list, tuple))
                        else [str(value)]
                    )
                    fields.append(self._registry.create_facet_field(name, path))
            else:
                for value in values:
                    if name == IDFIELD:
                        raise ValueError(
                            f"Field '{IDFIELD}' is protected and created by the engine"
                        )
                    fields.append(self._registry.create_field(name, value))
        return fields


def _identity_factory(fieldname: str, value: Any) -> Iterable[tuple[str, Any]]:
    return [(fieldname, value)]


class FieldsListToDoc:
    """Ordered ``[(name, value)]`` → wire document
    (fieldslisttolucenedocument.py:35-66)."""

    def __init__(
        self,
        field_registry: FieldRegistry,
        untokenized_fieldnames: Iterable[str] = (),
        index_field_factory: Callable | None = None,
        rewrite_identifier: Callable[[str], str] | None = None,
    ) -> None:
        self._registry = field_registry
        self._untokenized_fieldnames = list(untokenized_fieldnames)
        self._factory = index_field_factory
        self._rewrite_identifier = rewrite_identifier or (lambda i: i)

    def add(
        self, identifier: str, fieldslist: Iterable[tuple[str, Any]]
    ) -> tuple[str, list[dict]]:
        factory = (
            self._factory(self, self._untokenized_fieldnames)
            if self._factory is not None
            else None
        )
        fields: list[dict] = []
        for fieldname, value in fieldslist:
            produced = (
                factory.fields_for(fieldname, value)
                if factory is not None
                else _identity_factory(fieldname, value)
            )
            for name, v in produced:
                self._append(fields, name, v)
        return self._rewrite_identifier(identifier), fields

    def _append(self, fields: list[dict], fieldname: str, value: Any) -> None:
        if self._registry.is_drilldown_field(fieldname):
            path = [value] if isinstance(value, str) else list(value)
            if not path:
                return  # empty path dropped (:56-58)
            leaf = str(path[-1])
            path[-1] = leaf[:MAX_FACET_LEAF_VALUE_LENGTH]  # 256-char cap (:59-61)
            fields.append(self._registry.create_facet_field(fieldname, path))
        if self._registry.is_index_field(fieldname):
            fields.append(self._registry.create_field(fieldname, value))


def doc_to_row(fields: list[dict], text_sep: str = " ") -> dict[str, Any]:
    """Flatten one wire document into a columnar ingest row: repeated
    TextField values join with ``text_sep`` (the positionIncrementGap
    analog), FacetField paths become ``list<string>`` columns (one
    hierarchical path, or the union of 1-leaf paths for a flat multi-valued
    facet), typed values pass through.  Limitation (documented): multiple
    MULTI-SEGMENT paths on one facet field collapse to the last one — the
    columnar layout stores one path per doc."""
    row: dict[str, Any] = {}
    for f in fields:
        name = f["name"]
        if f.get("path") is not None:
            prev = row.get(name)
            path = f["path"]
            if isinstance(prev, list) and len(prev) <= 1 and len(path) == 1:
                row[name] = prev + path  # flat multi-valued facet
            else:
                row[name] = list(path)
        elif f["type"] == "TextField" and isinstance(row.get(name), str):
            row[name] = row[name] + text_sep + f["value"]
        else:
            row[name] = f["value"]
    return row
