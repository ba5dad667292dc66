"""Lightweight columnar codecs (pure numpy — no Spark dependency).

Integer codecs (int32 value streams): PLAIN, BITPACK, FOR (frame-of-reference),
RLE, DICT — self-describing recursive blob format, see ``ints.py``.
String codecs: STR_PLAIN, STR_DICT, FSST (symbol-table byte compression) —
see ``strings.py``. Optional transparent zstd post-pass (like Parquet pages)
— see ``ints.py:wrap_zstd``.

The reference POC's one explicit lightweight encoding is pandas categorical
(dictionary) + float downcast (/root/reference/src/parquet_reader.py:464-494);
this package generalizes that seed into the full codec set demanded by the
north rule, with per-chunk auto-selection in ``select.py``.
"""

from .ints import (
    CODEC_NAMES,
    decode_ints,
    encode_ints,
    encode_ints_auto,
    int_stats,
    estimate_sizes,
    unwrap_zstd,
    wrap_zstd,
)
from .strings import decode_strings, encode_strings_auto
from .select import select_int_codec

__all__ = [
    "CODEC_NAMES",
    "decode_ints",
    "encode_ints",
    "encode_ints_auto",
    "int_stats",
    "estimate_sizes",
    "select_int_codec",
    "encode_strings_auto",
    "decode_strings",
    "wrap_zstd",
    "unwrap_zstd",
]
