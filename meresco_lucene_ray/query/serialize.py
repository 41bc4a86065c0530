"""Query AST (de)serialization — the JSON wire-format analog.

The reference ships queries between processes as JSON dicts
(meresco/lucene/_lucene.py:187-198; JsonQueryConverter parses them at
/root/reference/src/org/meresco/lucene/JsonQueryConverter.java:189-339, and
ComposedQuery round-trips at ComposedQuery.java:93-138).  Here the same
round-trip lets queries cross process/actor boundaries or be persisted.

KeyFilterQ bitsets are serialized packed (np.packbits, the exportKeys wire
format — Utils.java:106-126) with base64 for JSON safety.
"""

from __future__ import annotations

import base64
from dataclasses import fields
from typing import Any

import numpy as np

from .ast import (
    BoolQ,
    DocValEqQ,
    GeoDistanceQ,
    KeyFilterQ,
    MatchAllQ,
    PathPrefixQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    TermQ,
    WildcardQ,
)

def _node_types():
    from ..join.relational import RelAnd, RelLeaf, RelNot, RelOr
    from .ast import RelationalQ

    return {
        c.__name__: c
        for c in (
            MatchAllQ,
            TermQ,
            PhraseQ,
            PrefixQ,
            WildcardQ,
            RangeQ,
            DocValEqQ,
            PathPrefixQ,
            GeoDistanceQ,
            KeyFilterQ,
            BoolQ,
            RelationalQ,
            RelLeaf,
            RelAnd,
            RelOr,
            RelNot,
        )
    }


_TYPES: dict[str, Any] = {}


def _types() -> dict[str, Any]:
    if not _TYPES:
        _TYPES.update(_node_types())
    return _TYPES


def query_to_dict(q) -> dict[str, Any]:
    types = _types()
    t = type(q).__name__
    if t not in types:
        raise TypeError(f"not a query node: {q!r}")
    out: dict[str, Any] = {"type": t}
    for f in fields(q):
        v = getattr(q, f.name)
        if t == "KeyFilterQ" and f.name == "bitset":
            bits = np.asarray(v, dtype=bool)
            out["bitset_b64"] = base64.b64encode(np.packbits(bits).tobytes()).decode()
            out["bitset_size"] = int(bits.size)
        elif type(v).__name__ in types:
            out[f.name] = query_to_dict(v)  # nested node (Rel*/RelationalQ)
        elif isinstance(v, tuple):
            out[f.name] = [
                query_to_dict(e) if type(e).__name__ in types else e for e in v
            ]
        else:
            out[f.name] = v
    return out


def query_from_dict(d: dict[str, Any]):
    types = _types()
    t = d["type"]
    cls = types[t]
    kwargs: dict[str, Any] = {}
    for f in fields(cls):
        if t == "KeyFilterQ" and f.name == "bitset":
            raw = base64.b64decode(d["bitset_b64"])
            kwargs["bitset"] = np.unpackbits(
                np.frombuffer(raw, dtype=np.uint8), count=d["bitset_size"]
            ).astype(bool)
        elif f.name in d:
            v = d[f.name]
            if isinstance(v, dict) and v.get("type") in types:
                v = query_from_dict(v)
            elif isinstance(v, list):
                v = [
                    query_from_dict(e)
                    if isinstance(e, dict) and e.get("type") in types
                    else e
                    for e in v
                ]
                if f.type.startswith("tuple"):
                    v = tuple(v)
            kwargs[f.name] = v
    return cls(**kwargs)
