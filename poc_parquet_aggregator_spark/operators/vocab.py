"""Vocabulary surgery over the pre-tokenized sequence table.

``remap_tokens`` applies an old-id → new-id table to every token — the
operator behind vocab pruning (drop rare ids to UNK after a
``text_vocab_topk``-style frequency pass), tokenizer migrations, and
id-space compaction before bit-packing (a dense id space lowers the
per-token bit width the FOR/BITPACK codecs pay for).

Kernel shape mirrors the encode path (encode/pipeline.py): zero-copy
ListArray flatten → ONE ``np.take`` over the whole Arrow batch → ListArray
rebuilt on the original offsets. No per-row Python, no per-doc arrays; the
mapping ships once per executor via a Spark broadcast (at 10^12 sequences
the mapping is a few hundred KB against terabytes of tokens).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame


def remap_tokens(df: DataFrame, mapping: "np.ndarray", unk_id: int = 0) -> DataFrame:
    """Return ``df`` with every token ``t`` replaced by ``mapping[t]``;
    ids outside ``[0, len(mapping))`` and ids mapped to a negative value
    become ``unk_id``. Schema (and n_tok) unchanged — the remap is 1:1."""
    mapping = np.ascontiguousarray(mapping, dtype=np.int32)
    if mapping.ndim != 1:
        raise ValueError("mapping must be a 1-D old-id → new-id array")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(mapping)
    schema = df.schema
    names = [f.name for f in schema.fields]
    i_tok = names.index("tokens")

    def remap_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        m = bc.value
        n_vocab = len(m)
        for batch in batches:
            tok = batch.column(i_tok)
            if batch.num_rows == 0:
                yield batch
                continue
            if tok.null_count:
                # a NULL list entry would make value_lengths() float64 with
                # NaN and silently corrupt the rebuilt int32 offsets (token
                # misalignment, not an error) — reject loudly (r3 ADVICE);
                # the sequence-table schema is non-null (input_hint)
                raise ValueError("tokens column contains NULL lists")
            # combine_chunks-free zero-copy flatten (respects offsets)
            flat = tok.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            in_range = (flat >= 0) & (flat < n_vocab)
            out = np.full(len(flat), unk_id, dtype=np.int32)
            taken = m[flat[in_range]]
            out[in_range] = np.where(taken < 0, unk_id, taken)
            lengths = tok.value_lengths().to_numpy(zero_copy_only=False)
            offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            # >2^31 tokens in one batch would wrap an int32 cumsum silently
            if offsets[-1] > np.iinfo(np.int32).max:
                raise ValueError("batch token count overflows int32 offsets")
            offsets = offsets.astype(np.int32)
            new_tok = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(out, type=pa.int32())
            )
            cols = [
                new_tok if i == i_tok else batch.column(i)
                for i in range(batch.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(cols, schema=batch.schema)

    return df.mapInArrow(remap_batches, schema=schema)
