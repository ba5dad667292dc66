"""Token-membership filters over the encoded table.

A training-data pipeline's sharpest selective read is by token CONTENT:
"every document containing canary token X" (contamination audits),
"sequences containing a special/control token" (filtering before a run),
"documents with any token from a banned id set". At 10^12 sequences that
query must NOT decode every token blob — it needs the Iceberg-puffin /
Parquet-bloom discipline applied to this format's own metadata:

  * per CHUNK: a token-membership filter rides the chunk row
    (``tok_filter`` binary column) next to the zone columns ``tok_min`` /
    ``tok_max``. The zones prune at the parquet scan via row-group stats
    (JVM-side, before any blob IO); the filter prunes the DECODE of
    chunks whose token range overlaps but which don't contain the id.
  * per FILE: the OR of the chunk filters lands in a sidecar
    ``_tokfilters/<stem>.bin`` (written under the same atomic commit as
    the manifest record, which carries the file-level ``tok_min`` /
    ``tok_max``). A token read prunes whole files driver-side before any
    parquet footer is opened — the manifest-level analog of the doc_id /
    n_tok bounds, kept OUT of the manifest JSON so listing cost doesn't
    grow by kilobytes per file (Iceberg keeps blooms in puffin sidecars
    for the same reason).

Filter modes (one byte in the header, per filter, chosen by value span):

  * EXACT (mode 1): a bitmap over ``[tok_min, tok_max]`` — bit j set iff
    token ``tok_min + j`` occurs. Chosen when the span is ≤ 2^20 (raw
    bitmap ≤ 128 KiB before the zstd pass — a 50k-token vocab costs
    ~6 KiB raw and compresses to ~1-2 KiB against multi-MB chunk blobs).
    NO false positives and no false negatives: for real tokenizer vocabs
    (50k-256k ids) every chunk takes this mode.
  * HASHED (mode 2): a fixed 2^15-bit one-hash bloom over a Fibonacci
    hash of the id, for arbitrary int32 token spaces where an exact
    bitmap would not fit. No false negatives; false positives only cost
    a wasted decode, never a wrong row (the exact post-decode filter is
    always applied).

Both modes are deterministic functions of the chunk's values, so resume
re-produces byte-identical filters (the manifest/commit invariant).

Reference analog: the reference validates Parquet STATISTICS against
expected aggregates (src/parquet_generator.py footer metadata writes);
this module is that idea promoted to content-addressed read pruning.
"""

from __future__ import annotations

import struct

import numpy as np

from ..codecs.ints import unwrap_zstd, wrap_zstd

MODE_EXACT = 1
MODE_HASHED = 2

EXACT_SPAN_LIMIT = 1 << 20  # max exact-bitmap span (128 KiB raw)
HASHED_BITS = 1 << 15  # fallback one-hash bloom width (4 KiB raw)

_FIB = np.uint64(0x9E3779B97F4A7C15)
# header: mode u8 | tok_min i64 | tok_max i64 | nbits u32
_HDR = struct.Struct("<BqqI")


def _hash_slots(ids: np.ndarray, nbits: int) -> np.ndarray:
    """Fibonacci-hash int token ids into [0, nbits) (nbits a power of 2).
    The multiply diffuses low-entropy id patterns (sequential vocab ids)
    across the high bits; we read the slot from the top 32."""
    v = ids.astype(np.int64).view(np.uint64)
    return ((v * _FIB) >> np.uint64(32)).astype(np.uint64) & np.uint64(nbits - 1)


def _pack(mode: int, lo: int, hi: int, nbits: int, present: np.ndarray) -> bytes:
    bits = np.packbits(present, bitorder="little")
    return _HDR.pack(mode, lo, hi, nbits) + wrap_zstd(bits.tobytes(), level=3)


def build_token_filter(flat: np.ndarray) -> bytes:
    """Membership filter over one chunk's flattened token values."""
    if flat.size == 0:
        # empty value set: inverted zone (hi < lo) rejects every probe
        return _pack(MODE_EXACT, 0, -1, 0, np.zeros(0, dtype=np.bool_))
    lo, hi = int(flat.min()), int(flat.max())
    span = hi - lo + 1
    if span <= EXACT_SPAN_LIMIT:
        present = np.zeros(span, dtype=np.bool_)
        present[flat.astype(np.int64) - lo] = True  # O(n), no sort
        return _pack(MODE_EXACT, lo, hi, span, present)
    present = np.zeros(HASHED_BITS, dtype=np.bool_)
    present[_hash_slots(flat, HASHED_BITS)] = True
    return _pack(MODE_HASHED, lo, hi, HASHED_BITS, present)


def _parse(blob: bytes) -> tuple[int, int, int, int, bytes]:
    mode, lo, hi, nbits = _HDR.unpack_from(blob)
    return mode, lo, hi, nbits, blob[_HDR.size :]


def token_filter_bounds(blob: bytes) -> tuple[int, int]:
    """(tok_min, tok_max) recorded in the filter header (hi < lo = empty)."""
    _, lo, hi, _, _ = _parse(blob)
    return lo, hi


def token_filter_contains(blob: bytes, token: int) -> bool:
    """May the filtered value set contain ``token``? Never a false
    negative; false positives only in HASHED mode."""
    mode, lo, hi, nbits, payload = _parse(blob)
    if token < lo or token > hi:
        return False
    bits = np.frombuffer(unwrap_zstd(payload), dtype=np.uint8)
    if mode == MODE_EXACT:
        j = token - lo
    else:
        j = int(_hash_slots(np.asarray([token]), nbits)[0])
    return bool((bits[j >> 3] >> (j & 7)) & 1)


def token_filter_contains_any(blob: bytes, tokens) -> bool:
    """ANY-match probe over an id list: may the filtered value set contain
    any of ``tokens``? One header parse + one zstd decompression for the
    whole list — the per-id loop through ``token_filter_contains`` paid K
    decompressions per filter for a K-id banned set (r6 ADVICE). Verdict
    identical to ``any(token_filter_contains(blob, t) for t in tokens)``."""
    mode, lo, hi, nbits, payload = _parse(blob)
    ids = np.asarray([int(t) for t in tokens if lo <= t <= hi], dtype=np.int64)
    if ids.size == 0:
        return False
    bits = np.frombuffer(unwrap_zstd(payload), dtype=np.uint8)
    j = ids - lo if mode == MODE_EXACT else _hash_slots(ids, nbits).astype(np.int64)
    return bool(((bits[j >> 3] >> (j & 7).astype(np.uint8)) & 1).any())


def _exact_ids(lo: int, nbits: int, payload: bytes) -> np.ndarray:
    bits = np.frombuffer(unwrap_zstd(payload), dtype=np.uint8)
    present = np.unpackbits(bits, count=nbits, bitorder="little").astype(np.bool_)
    return lo + np.flatnonzero(present)


def merge_token_filters(blobs: list[bytes]) -> bytes:
    """OR chunk filters into one file-level filter (the sidecar payload).

    Exact inputs whose union span still fits stay exact (zero false
    positives file-level too). Any hashed input, or an over-limit union
    span, degrades the merge to HASHED — exact inputs re-hash by
    enumerating their set bits (≤ 2^20 ids, one vectorized pass each)."""
    parsed = [p for p in (_parse(b) for b in blobs) if p[2] >= p[1]]
    if not parsed:
        return _pack(MODE_EXACT, 0, -1, 0, np.zeros(0, dtype=np.bool_))
    lo = min(p[1] for p in parsed)
    hi = max(p[2] for p in parsed)
    span = hi - lo + 1
    if all(p[0] == MODE_EXACT for p in parsed) and span <= EXACT_SPAN_LIMIT:
        present = np.zeros(span, dtype=np.bool_)
        for _, b_lo, _b_hi, nbits, payload in parsed:
            bits = np.frombuffer(unwrap_zstd(payload), dtype=np.uint8)
            part = np.unpackbits(bits, count=nbits, bitorder="little")
            off = b_lo - lo
            np.logical_or(
                present[off : off + nbits], part.astype(np.bool_),
                out=present[off : off + nbits],
            )
        return _pack(MODE_EXACT, lo, hi, span, present)
    present = np.zeros(HASHED_BITS, dtype=np.bool_)
    for mode, b_lo, _b_hi, nbits, payload in parsed:
        if mode == MODE_HASHED:
            bits = np.frombuffer(unwrap_zstd(payload), dtype=np.uint8)
            part = np.unpackbits(bits, count=nbits, bitorder="little")
            if nbits == HASHED_BITS:
                np.logical_or(present, part.astype(np.bool_), out=present)
            else:  # defensive: re-hash slots of a differently-sized bloom
                # can't recover ids from a bloom — saturate conservatively
                present[:] = True
        else:
            ids = _exact_ids(b_lo, nbits, payload)
            present[_hash_slots(ids, HASHED_BITS)] = True
    return _pack(MODE_HASHED, lo, hi, HASHED_BITS, present)
