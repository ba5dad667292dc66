"""String-column codecs: STR_PLAIN, STR_DICT, FSST.

A string chunk is (concatenated utf-8 payload, int32 lengths). Lengths ride
the integer codec framework (ints.py); the payload gets one of:

* STR_PLAIN — raw bytes.
* STR_DICT  — dictionary of distinct strings + bit-packed codes; the Spark
  form of the reference's pandas-categorical optimization
  (/root/reference/src/parquet_reader.py:464-494, "50-70% memory savings").
* FSST      — symbol-table byte compression (Boncz/Neumann/Leis, "FSST: Fast
  Random Access String Compression", VLDB 2020): up to 254 symbols of 1-8
  bytes learned from a sample by iterative pair-merging; greedy
  longest-match encode; escape byte 0xFF for uncovered bytes. The encode hot
  path is a compiled regex alternation (C-speed scan, leftmost-longest via
  length-sorted alternation) — no per-character Python.

Blob format: ``codec_id:uint8 || payload`` like ints.py, ids disjoint from
the integer ids so a blob is always self-describing.
"""

from __future__ import annotations

import re
import struct
from collections import Counter

import numpy as np

from .ints import (
    ZSTD,
    decode_ints,
    encode_ints_best,
    unwrap_zstd,
)
from .ints import BITPACK as _BITPACK
from .ints import encode_ints as _encode_ints

STR_PLAIN = 16
STR_DICT = 17
FSST = 18

STR_CODEC_NAMES = {STR_PLAIN: "str_plain", STR_DICT: "str_dict", FSST: "fsst"}

_U32 = struct.Struct("<I")

_ESCAPE = 0xFF
_MAX_SYMBOLS = 254  # codes 0..253; 0xFF = escape
_MAX_SYMBOL_LEN = 8
_TRAIN_ITERS = 5


def _child(blob: bytes) -> bytes:
    return _U32.pack(len(blob)) + blob


def _concat(strings: "np.ndarray | list[str]") -> tuple[bytes, np.ndarray]:
    bs = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int32, count=len(bs))
    return b"".join(bs), lens


# ------------------------------------------------------------- FSST training


def _train_symbols(sample_strings: list[bytes]) -> list[bytes]:
    """Learn ≤254 symbols by iterative re-parse + pair-merge (FSST §3.3
    shape): parse the sample under the current table, credit each symbol its
    REALIZED gain ((len-1) × frequency), propose adjacent-pair
    concatenations at a discounted gain, always retain observed single
    bytes (escape avoidance), keep the top earners. 6 rounds converge on
    e.g. 8-byte digit-prefix symbols for doc-id-style strings (measured
    3.9× on 'doc-%012d' vs 1.3× for the naive one-shot count)."""
    if not sample_strings:
        return []
    counts = Counter(b for s in sample_strings for b in s)
    table = [bytes([b]) for b, _ in counts.most_common(_MAX_SYMBOLS)]
    for _ in range(_TRAIN_ITERS):
        pattern = _compile_pattern(table)
        sym_freq: Counter = Counter()
        pair_freq: Counter = Counter()
        for d in sample_strings:
            toks = pattern.findall(d)
            sym_freq.update(toks)
            for a, b in zip(toks, toks[1:]):
                if len(a) + len(b) <= _MAX_SYMBOL_LEN:
                    pair_freq[a + b] += 1
        gain: Counter = Counter()
        for s, c in sym_freq.items():
            gain[s] = (len(s) - 1) * c
        for s, c in pair_freq.items():
            gain[s] += (len(s) - 1) * c // 2  # discount un-realized pairs
        singles = [s for s in gain if len(s) == 1]
        multis = sorted((s for s in gain if len(s) > 1), key=lambda s: (-gain[s], s))
        table = (singles + multis)[:_MAX_SYMBOLS]
    table.sort(key=lambda s: (-len(s), s))
    return table


def _compile_pattern(table: list[bytes]) -> "re.Pattern[bytes]":
    # longest-first alternation → greedy longest match at each position;
    # trailing '.' (DOTALL) consumes bytes not covered by any symbol.
    alts = sorted(table, key=len, reverse=True)
    pat = b"|".join(re.escape(s) for s in alts)
    if pat:
        pat += b"|"
    return re.compile(pat + b"(?s:.)")


def _fsst_decode_payload(enc: bytes, table: list[bytes]) -> bytes:
    out = bytearray()
    i, n = 0, len(enc)
    append = out.extend
    while i < n:
        b = enc[i]
        if b == _ESCAPE:
            append(enc[i + 1 : i + 2])
            i += 2
        else:
            append(table[b])
            i += 1
    return bytes(out)


# ----------------------------------------------------------------- encoders


def encode_strings(strings, codec_id: int) -> bytes:
    payload, lens = _concat(strings)
    lens_blob = encode_ints_best(lens)
    if codec_id == STR_PLAIN:
        return bytes([STR_PLAIN]) + _U32.pack(len(lens)) + _child(lens_blob) + payload
    if codec_id == STR_DICT:
        uniq, codes = np.unique(np.asarray(strings, dtype=object), return_inverse=True)
        dict_blob = encode_strings(list(uniq), STR_PLAIN)
        codes_blob = _encode_ints(codes.astype(np.int32), _BITPACK)
        return (
            bytes([STR_DICT])
            + _U32.pack(len(codes))
            + _child(dict_blob)
            + _child(codes_blob)
        )
    if codec_id == FSST:
        return _fsst_from_payload(payload, lens)
    raise ValueError(f"unknown string codec {codec_id}")


def _fsst_from_payload(payload: bytes, lens: np.ndarray) -> bytes:
    """FSST-encode a string chunk given only its flat utf-8 payload and
    per-string lengths — the representation Arrow's offsets/data buffers
    give for free, so no per-row Python strings are ever materialized
    (bytes SLICES of one payload are cheap; decoded PyUnicode objects are
    the measured 10× TLB-storm at 32 workers). Symbols never span string
    boundaries (FSST's per-string semantics), which also yields exact
    per-string encoded lengths for random-access decode."""
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    n_sample = min(512, len(lens))
    sample_strings = [payload[offs[i] : offs[i + 1]] for i in range(n_sample)]
    table = _train_symbols(sample_strings)
    pattern = _compile_pattern(table)
    code_of = {s: bytes([i]) for i, s in enumerate(table)}
    esc = bytes([_ESCAPE])

    def repl(m: "re.Match[bytes]") -> bytes:
        c = code_of.get(m.group(0))
        return c if c is not None else esc + m.group(0)

    pieces = [
        pattern.sub(repl, payload[offs[i] : offs[i + 1]]) for i in range(len(lens))
    ]
    enc = b"".join(pieces)
    enc_lens = np.fromiter((len(p) for p in pieces), dtype=np.int32, count=len(pieces))
    sym_blob = b"".join(bytes([len(s)]) + s for s in table)
    return (
        bytes([FSST])
        + _U32.pack(len(lens))
        + bytes([len(table)])
        + _child(sym_blob)
        + _child(encode_ints_best(enc_lens))
        + enc
    )


def encode_strings_auto(strings) -> tuple[bytes, int]:
    """Pick STR_DICT / FSST / STR_PLAIN by measured size on the chunk."""
    arr = np.asarray(strings, dtype=object)
    n = len(arr)
    if n == 0:
        return encode_strings(arr, STR_PLAIN), STR_PLAIN
    n_distinct = len(np.unique(arr))
    candidates: list[tuple[int, bytes]] = []
    if n_distinct <= max(16, n // 4):
        candidates.append((STR_DICT, encode_strings(arr, STR_DICT)))
    plain = encode_strings(arr, STR_PLAIN)
    candidates.append((STR_PLAIN, plain))
    # FSST only worth trying when payload is big enough to amortize the table
    if len(plain) > 4096 and n_distinct > 16:
        candidates.append((FSST, encode_strings(arr, FSST)))
    codec_id, blob = min(candidates, key=lambda t: len(t[1]))
    return blob, codec_id


# --------------------------------------------------- Arrow-native fast path


def _plain_from_buffers(payload: bytes, lens: np.ndarray) -> bytes:
    lens_blob = encode_ints_best(np.ascontiguousarray(lens, dtype=np.int32))
    return bytes([STR_PLAIN]) + _U32.pack(len(lens)) + _child(lens_blob) + payload


def encode_strings_arrow(arr, zstd_post: bool = True) -> tuple[bytes, int]:
    """Encode a pyarrow StringArray WITHOUT materializing per-row Python
    strings (the object churn causes allocator TLB storms at high task
    concurrency — measured 10× collapse at 32 workers).

    Selection is sample-driven per the north rule: candidates are sized on a
    512-string sample (post-zstd when the zstd pass is on — that is the size
    that matters), winner encodes the full column:
      * low cardinality → STR_DICT via pyarrow dictionary_encode (C++)
      * else STR_PLAIN straight from the Arrow offsets/data buffers
      * FSST when the sampled trial says it beats plain after zstd
    Returns (blob, codec_id); blob is NOT zstd-wrapped (caller wraps).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    if n == 0:
        return _plain_from_buffers(b"", np.zeros(0, np.int32)), STR_PLAIN
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count:
        arr = arr.fill_null("")

    dict_arr = pc.dictionary_encode(arr)
    n_distinct = len(dict_arr.dictionary)
    if n_distinct <= max(16, n // 4):
        dict_blob = encode_strings(dict_arr.dictionary.to_pylist(), STR_PLAIN)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int32)
        codes_blob = _encode_ints(codes, _BITPACK)
        blob = (
            bytes([STR_DICT]) + _U32.pack(n) + _child(dict_blob) + _child(codes_blob)
        )
        return blob, STR_DICT

    # flat payload + lengths straight from Arrow buffers (zero python objects)
    flat = arr.cast(pa.string())
    buf = flat.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int32, count=n + 1, offset=flat.offset * 4)
    payload = bytes(
        memoryview(buf[2])[int(offsets[0]) : int(offsets[-1])]
    )
    lens = np.diff(offsets).astype(np.int32)

    plain_blob = _plain_from_buffers(payload, lens)
    # sampled FSST trial (on payload slices — still zero Python strings):
    # is FSST+zstd smaller than plain+zstd?
    n_sample = min(512, n)
    sample_lens = lens[:n_sample]
    sample_payload = payload[: int(sample_lens.sum())]
    from .ints import wrap_zstd as _wz

    post = _wz if zstd_post else (lambda b: b)
    fsst_sample = _fsst_from_payload(sample_payload, sample_lens)
    plain_sample = _plain_from_buffers(sample_payload, sample_lens)
    if len(post(fsst_sample)) < 0.9 * len(post(plain_sample)):
        return _fsst_from_payload(payload, lens), FSST
    return plain_blob, STR_PLAIN


# ----------------------------------------------------------------- decoders


def decode_strings(blob: bytes) -> list[str]:
    if blob[0] == ZSTD:
        return decode_strings(unwrap_zstd(blob))
    codec_id = blob[0]
    body = memoryview(blob)[1:]
    if codec_id == STR_PLAIN:
        (n,) = _U32.unpack_from(body, 0)
        (llen,) = _U32.unpack_from(body, 4)
        lens = decode_ints(bytes(body[8 : 8 + llen]))
        payload = bytes(body[8 + llen :])
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        return [payload[offs[i] : offs[i + 1]].decode("utf-8") for i in range(n)]
    if codec_id == STR_DICT:
        (n,) = _U32.unpack_from(body, 0)
        (dlen,) = _U32.unpack_from(body, 4)
        uniq = decode_strings(bytes(body[8 : 8 + dlen]))
        (clen,) = _U32.unpack_from(body, 8 + dlen)
        codes = decode_ints(bytes(body[12 + dlen : 12 + dlen + clen]))
        uarr = np.asarray(uniq, dtype=object)
        return list(uarr[codes])
    if codec_id == FSST:
        (n,) = _U32.unpack_from(body, 0)
        n_sym = body[4]
        (slen,) = _U32.unpack_from(body, 5)
        sym_raw = bytes(body[9 : 9 + slen])
        table, i = [], 0
        for _ in range(n_sym):
            ln = sym_raw[i]
            table.append(sym_raw[i + 1 : i + 1 + ln])
            i += 1 + ln
        (ellen,) = _U32.unpack_from(body, 9 + slen)
        enc_lens = decode_ints(bytes(body[13 + slen : 13 + slen + ellen]))
        enc = bytes(body[13 + slen + ellen :])
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(enc_lens, out=offs[1:])
        return [
            _fsst_decode_payload(enc[offs[i] : offs[i + 1]], table).decode("utf-8")
            for i in range(n)
        ]
    raise ValueError(f"unknown string codec {codec_id}")


def decode_strings_arrow(blob: bytes) -> "object":
    """Decode a string chunk directly to a pyarrow StringArray — the
    decode-side twin of encode_strings_arrow: the utf-8 payload and offsets
    become Arrow buffers with ZERO per-row PyUnicode objects (the encode
    side's measured TLB-storm applies symmetrically on read-back).
    STR_PLAIN builds from buffers; STR_DICT decodes the (small) dictionary
    then materializes via C++ take; FSST decodes per-string payloads (the
    symbol scan is per-string by format) but still assembles the result
    from one concatenated buffer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if blob[0] == ZSTD:
        return decode_strings_arrow(unwrap_zstd(blob))
    codec_id = blob[0]
    body = memoryview(blob)[1:]

    def _from_payload(payload: bytes, lens: np.ndarray, n: int) -> "pa.Array":
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        if offs[-1] > np.iinfo(np.int32).max:  # ≥2 GiB payload: 64-bit offsets
            return pa.Array.from_buffers(
                pa.large_utf8(), n,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(payload)],
            )
        return pa.Array.from_buffers(
            pa.utf8(), n,
            [None, pa.py_buffer(offs.astype(np.int32).tobytes()), pa.py_buffer(payload)],
        )

    if codec_id == STR_PLAIN:
        (n,) = _U32.unpack_from(body, 0)
        (llen,) = _U32.unpack_from(body, 4)
        lens = decode_ints(bytes(body[8 : 8 + llen]))
        return _from_payload(bytes(body[8 + llen :]), lens, n)
    if codec_id == STR_DICT:
        (n,) = _U32.unpack_from(body, 0)
        (dlen,) = _U32.unpack_from(body, 4)
        uniq = decode_strings_arrow(bytes(body[8 : 8 + dlen]))
        (clen,) = _U32.unpack_from(body, 8 + dlen)
        codes = decode_ints(bytes(body[12 + dlen : 12 + dlen + clen]))
        return pc.take(uniq, pa.array(codes, type=pa.int32()))
    if codec_id == FSST:
        (n,) = _U32.unpack_from(body, 0)
        n_sym = body[4]
        (slen,) = _U32.unpack_from(body, 5)
        sym_raw = bytes(body[9 : 9 + slen])
        table, i = [], 0
        for _ in range(n_sym):
            ln = sym_raw[i]
            table.append(sym_raw[i + 1 : i + 1 + ln])
            i += 1 + ln
        (ellen,) = _U32.unpack_from(body, 9 + slen)
        enc_lens = decode_ints(bytes(body[13 + slen : 13 + slen + ellen]))
        enc = bytes(body[13 + slen + ellen :])
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(enc_lens, out=offs[1:])
        pieces = [_fsst_decode_payload(enc[offs[i] : offs[i + 1]], table) for i in range(n)]
        lens = np.fromiter((len(p) for p in pieces), dtype=np.int32, count=n)
        return _from_payload(b"".join(pieces), lens, n)
    raise ValueError(f"unknown string codec {codec_id}")
