"""SchemaPolicy — the FieldRegistry analog.

Re-expresses the reference's dynamic per-field-name schema resolution
(/root/reference/meresco/lucene/fieldregistry.py:114-134) as a pure-Python
policy object mapping column name → role:

| prefix / name      | role      | reference behavior |
|--------------------|-----------|--------------------|
| ``__id__``         | ID        | untokenized, stored (fieldregistry.py:42-44) |
| ``sorted.``        | KEYWORD(sort=True) | SortedDocValues (:123-124) |
| ``untokenized.``   | KEYWORD   | StringField (:123-124) |
| ``__key__.``       | KEY       | numerated int NumericDocValues (:125-126) |
| ``__numeric__.``   | NUMERIC   | long docvalue (:127-128) |
| ``range.double.``  | NUMERIC   | Point type, range-queryable (:129-130) |
| ``range.int.``     | NUMERIC   | Point type (:131-132) |
| registered drilldowns | FACET  | taxonomy FacetField (:58-59,80-85) |
| default            | TEXT      | tokenized BM25 field (:46) |

Registration hooks mirror ``FieldRegistry.register`` (:64-68): exact names
or predicates override the prefix rules.  ``to_index_config`` turns a policy
plus a record schema into the engine's IndexConfig (text column + stored
docvalue columns).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Callable

from .index.build import IndexConfig

MAX_FACET_LEAF_VALUE_LENGTH = 256  # fieldslisttolucenedocument.py:66


class Role(enum.Enum):
    ID = "id"
    TEXT = "text"
    KEYWORD = "keyword"
    NUMERIC = "numeric"
    KEY = "key"
    FACET = "facet"


@dataclass
class FieldDef:
    role: Role
    stored: bool = False
    sort: bool = False
    hierarchical: bool = False  # facet paths split on '>'
    multi_valued: bool = True


DEFAULTS: list[tuple[str, FieldDef]] = [
    ("__id__", FieldDef(Role.ID, stored=True)),
    ("sorted.", FieldDef(Role.KEYWORD, sort=True)),
    ("untokenized.", FieldDef(Role.KEYWORD)),
    ("__key__.", FieldDef(Role.KEY)),
    ("__numeric__.", FieldDef(Role.NUMERIC)),
    ("range.double.", FieldDef(Role.NUMERIC)),
    ("range.int.", FieldDef(Role.NUMERIC)),
]


@dataclass
class SchemaPolicy:
    overrides: dict[str, FieldDef] = field(default_factory=dict)
    predicates: list[tuple[Callable[[str], bool], FieldDef]] = field(default_factory=list)
    drilldowns: dict[str, FieldDef] = field(default_factory=dict)

    def register(self, name_or_predicate, fdef: FieldDef) -> None:
        """FieldRegistry.register analog (fieldregistry.py:64-68)."""
        if callable(name_or_predicate):
            self.predicates.append((name_or_predicate, fdef))
        else:
            self.overrides[name_or_predicate] = fdef

    def register_drilldown(
        self, name: str, hierarchical: bool = False, multi_valued: bool = True
    ) -> None:
        """drilldownFields registration (fieldregistry.py:80-85)."""
        self.drilldowns[name] = FieldDef(
            Role.FACET, hierarchical=hierarchical, multi_valued=multi_valued
        )

    def resolve(self, name: str) -> FieldDef:
        if name in self.overrides:
            return self.overrides[name]
        for pred, fdef in self.predicates:
            if pred(name):
                return fdef
        if name in self.drilldowns:
            return self.drilldowns[name]
        for prefix, fdef in DEFAULTS:
            if name == prefix or name.startswith(prefix):
                return fdef
        return FieldDef(Role.TEXT)

    def to_index_config(self, columns: list[str], **kw) -> IndexConfig:
        """Derive the engine IndexConfig from a record schema: the first TEXT
        column becomes the indexed text field; KEYWORD/NUMERIC/KEY/FACET
        columns become stored docvalues."""
        text_cols = [c for c in columns if self.resolve(c).role is Role.TEXT]
        if not text_cols:
            raise ValueError("no TEXT column resolved — register one")
        stored = tuple(
            c
            for c in columns
            if self.resolve(c).role in (Role.KEYWORD, Role.NUMERIC, Role.KEY, Role.FACET)
        )
        id_col = "__id__" if "__id__" in columns else None
        return IndexConfig(text_col=text_cols[0], id_col=id_col, stored_cols=stored, **kw)


def truncate_facet_value(value: str) -> str:
    """Facet leaf truncation (fieldslisttolucenedocument.py:59-66)."""
    return value[:MAX_FACET_LEAF_VALUE_LENGTH]


def facet_path(value: str) -> list[str]:
    """Hierarchical facet path split (queryexpressiontolucenequerydict.py:216-223)."""
    return [truncate_facet_value(p) for p in value.split(">")]
