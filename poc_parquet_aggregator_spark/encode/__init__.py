from .chunk import decode_token_chunk, encode_token_chunk
from .pipeline import decode_verify, encode_dataset, read_manifest

__all__ = [
    "encode_token_chunk",
    "decode_token_chunk",
    "encode_dataset",
    "decode_verify",
    "read_manifest",
]
