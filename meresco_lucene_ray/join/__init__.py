from .bitsets import (
    KeyBits,
    bitset_from_keys,
    keys_of_dataset,
    semi_join_filter,
    broadcast_lookup_join,
)
from .composed import ComposedQuery, MultiSearcher
from .relational import RelAnd, RelLeaf, RelNot, RelOr, RelationalRunner

__all__ = [
    "KeyBits",
    "bitset_from_keys",
    "keys_of_dataset",
    "semi_join_filter",
    "broadcast_lookup_join",
    "ComposedQuery",
    "MultiSearcher",
    "RelAnd",
    "RelLeaf",
    "RelNot",
    "RelOr",
    "RelationalRunner",
]
