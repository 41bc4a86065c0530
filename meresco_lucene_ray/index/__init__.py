from .codec import varint_encode, varint_decode, encode_postings, decode_postings
from .build import (
    add_documents,
    build_index,
    delete_by_query,
    delete_documents,
    IndexConfig,
)
from .manifest import IndexManifest

__all__ = [
    "varint_encode",
    "varint_decode",
    "encode_postings",
    "decode_postings",
    "add_documents",
    "build_index",
    "delete_by_query",
    "delete_documents",
    "IndexConfig",
    "IndexManifest",
]
