from .codec import varint_encode, varint_decode, encode_postings, decode_postings
from .build import build_index, IndexConfig
from .manifest import IndexManifest

__all__ = [
    "varint_encode",
    "varint_decode",
    "encode_postings",
    "decode_postings",
    "build_index",
    "IndexConfig",
    "IndexManifest",
]
