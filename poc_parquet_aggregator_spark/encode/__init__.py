from .chunk import decode_token_chunk, encode_token_chunk
from .pipeline import (
    compact_encoded,
    compact_manifest,
    decode_verify,
    encode_dataset,
    read_decoded,
    read_manifest,
)
from .salted import encode_dataset_by_source

__all__ = [
    "encode_token_chunk",
    "decode_token_chunk",
    "encode_dataset",
    "encode_dataset_by_source",
    "decode_verify",
    "read_decoded",
    "read_manifest",
    "compact_manifest",
    "compact_encoded",
]
