"""Deterministic generator for the pre-tokenized sequence table.

Schema (BASELINE.json input_hint):
    doc_id : string        -- "doc-%012d", high cardinality, shared prefix
    tokens : array<int32>  -- Zipfian ids in [0, 50257); log-normal lengths
    n_tok  : int32         -- len(tokens), verified on decode
    source : string        -- ~20 categories with a 60% skew head (exercises
                              the salted repartitioning path)

Mix of regimes so every codec wins somewhere (FIXTURES.md §0):
  * ~15% "runny" docs: tokens repeated in runs (RLE territory)
  * ~15% small-range docs: ids confined to a 64-value band (FOR/bit-pack)
  * remainder: Zipfian over full vocab (dict or plain+zstd territory)

Everything is seeded; the same (seed, n_docs) always produces byte-identical
parquet content, which the checkpoint/resume manifest relies on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
_SOURCES = [f"src{i:02d}" for i in range(20)]
# 60% skew head on src00, rest roughly geometric — per FIXTURES.md §0
_SOURCE_P = np.array([0.60] + [0.40 / 19] * 19)


def token_table_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("doc_id", pa.string(), nullable=False),
            pa.field("tokens", pa.list_(pa.int32()), nullable=False),
            pa.field("n_tok", pa.int32(), nullable=False),
            pa.field("source", pa.string(), nullable=False),
        ]
    )


def generate_token_table(
    n_docs: int, seed: int = 42, start_id: int = 0
) -> pa.Table:
    rng = np.random.default_rng([seed, start_id])
    lengths = np.clip(
        rng.lognormal(mean=5.0, sigma=1.0, size=n_docs).astype(np.int64), 1, 4096
    )
    # deterministic edge rows: length-1, all-identical, max-token boundary
    if n_docs >= 8:
        lengths[0] = 1
        lengths[1] = 4096
    total = int(lengths.sum())
    regime = rng.choice(3, size=n_docs, p=[0.70, 0.15, 0.15])

    # bulk Zipfian pool, folded into vocab
    flat = (rng.zipf(1.2, size=total) % VOCAB).astype(np.int32)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    for i in np.flatnonzero(regime == 1):  # runny docs
        n = lengths[i]
        n_runs = max(1, int(n // rng.integers(4, 32)))
        vals = rng.integers(0, VOCAB, n_runs).astype(np.int32)
        reps = rng.multinomial(n - n_runs, np.ones(n_runs) / n_runs) + 1
        flat[offsets[i] : offsets[i + 1]] = np.repeat(vals, reps)[:n]
    for i in np.flatnonzero(regime == 2):  # small-range docs
        base = int(rng.integers(0, VOCAB - 64))
        flat[offsets[i] : offsets[i + 1]] = base + rng.integers(
            0, 64, lengths[i]
        ).astype(np.int32)
    if n_docs >= 8:
        flat[offsets[2] : offsets[3]] = VOCAB - 1  # all-identical doc
        flat[offsets[3]] = np.int32(2**31 - 1) % VOCAB  # boundary-ish

    doc_ids = [f"doc-{start_id + i:012d}" for i in range(n_docs)]
    sources = rng.choice(np.asarray(_SOURCES, dtype=object), size=n_docs, p=_SOURCE_P)

    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(flat, type=pa.int32()),
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens_arr,
            "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        },
        schema=token_table_schema(),
    )


def write_token_table(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    docs_per_file: int = 25_000,
    compression: str = "zstd",
) -> list[str]:
    """Write the table as N parquet files (the engine's resume unit is the
    input file). Returns the file paths. Parquet(zstd) here IS the
    compression-ratio reference the engine must beat (BASELINE.md)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_docs, docs_per_file):
        n = min(docs_per_file, n_docs - start)
        tbl = generate_token_table(n, seed=seed, start_id=start)
        path = os.path.join(out_dir, f"tokens-{start:012d}.parquet")
        pq.write_table(tbl, path, compression=compression)
        paths.append(path)
    return paths
