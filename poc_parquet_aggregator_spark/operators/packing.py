"""Sequence packing: greedy assignment of variable-length documents into
fixed-context training examples — the step between a deduped corpus and a
training dataloader at 10^12-sequence scale.

Distributed form: ONE window cumsum per stream partition (source), pack id
= floor(start_offset / context). At 10^12-sequence scale the 60% head
source makes a bare per-source window one giant reducer — the engine twin
``pack_token_examples(n_streams=k)`` salts each source into independent
sub-streams (the gate query stays single-stream: sf-scale data, simpler
oracle). No shuffle beyond the partition sort, no
per-row Python, and the assignment is deterministic (total order by doc_id)
so a resumed job reproduces identical packs. Documents are never split:
a doc whose span crosses a boundary belongs to the pack where it STARTS, so
a pack may overflow by at most one doc — the standard "document packing
with overflow" used when attention masks separate docs anyway. The
fill-ratio output is the measurable packing efficiency.

Reference analog: none (beyond the reference's inventory, like
operators/extended.py) — this is a training-pipeline extension the graft's
tokens payload calls for. The driver-table query uses n_chars as the
length; ``pack_token_examples`` is the engine-side twin over real
(doc_id, tokens, n_tok, source) tables using n_tok.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .spread import spread

_CTX = 4096  # context budget for the driver-table query


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    w = Window.partitionBy("source").orderBy("doc_id")
    start = (
        F.sum("n_chars").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - F.col("n_chars")
    )
    packed = d.withColumn("pack_id", F.floor(start / F.lit(float(_CTX))))
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("pack_chars"),
        F.min("doc_id").alias("first_doc"),
        (F.sum("n_chars") / F.lit(float(_CTX))).alias("fill_ratio"),
    )


ORACLE_PACK = f"""
WITH c AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars AS start
  FROM documents)
SELECT source, CAST(floor(start / {_CTX}.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS pack_chars,
       min(doc_id) AS first_doc,
       CAST(sum(n_chars) AS BIGINT) / {_CTX}.0 AS fill_ratio
FROM c GROUP BY 1, 2
"""


def pack_token_examples(
    df: DataFrame, ctx_len: int = 2048, n_streams: int = 1
) -> DataFrame:
    """Engine-side packing over a real sequence table
    (doc_id, tokens, n_tok, source): returns one row per training example
    with the concatenated token array (flatten of the pack's docs in
    doc_id order), its length, and the member count. Same window-cumsum
    assignment as q_pack_sequences; the concat is a JVM flatten of
    collect_list over the pack — no Python.

    ``n_streams`` is the SKEW control at scale: the window partitions by
    source, and this corpus's head source carries 60% of all tokens — at
    10^12 sequences that is one reducer sorting 60% of the table. With
    n_streams > 1 each source splits into ``crc32(doc_id) % n_streams``
    sub-streams packed independently (same salting move as
    encode_dataset_by_source): deterministic, resume-stable, and packs
    simply never span sub-streams — packing imposes no cross-doc order
    anyway, so the only cost is ≤ one partial pack per extra stream."""
    keys = ["source"]
    if n_streams > 1:
        df = df.withColumn(
            "stream", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(n_streams))
        )
        keys = ["source", "stream"]
    w = Window.partitionBy(*keys).orderBy("doc_id")
    start = (
        F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - F.col("n_tok")
    )
    packed = df.withColumn("pack_id", F.floor(start / F.lit(float(ctx_len))))
    return (
        packed.groupBy(*keys, "pack_id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "tokens"))
                ).tokens
            ).alias("tokens"),
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tok"),
        )
    )


_TOK_CTX = 512  # context budget for the token-table twin


def q_pack_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-table twin for the engine-side packer (VERDICT r2 #8): a real
    (doc_id, tokens, n_tok, source) frame is synthesized from documents
    (token id = first 4 md5 hex digits of each word — portable), packed by
    ``pack_token_examples``, and the flattened token arrays are asserted
    via a per-pack md5 of the comma-joined ids — a fixed point DuckDB
    reproduces exactly, so the gate checks token-level equality of the
    packs, not just counts."""
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    words = F.split(F.lower(F.regexp_replace("text", r"\s+", " ")), " ")
    tokens = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int")
    )
    df = d.select("doc_id", "source", tokens.alias("tokens")).withColumn(
        "n_tok", F.size("tokens")
    )
    packed = pack_token_examples(df, ctx_len=_TOK_CTX)
    return packed.select(
        "source",
        "pack_id",
        F.md5(
            F.concat_ws(",", F.transform("tokens", lambda x: x.cast("string")))
        ).alias("pack_md5"),
        "n_docs",
        F.col("n_tok").cast("long").alias("n_tok"),
    )


ORACLE_PACK_TOKENS = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_transform(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                        w -> CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER)) AS tokens
  FROM documents),
sized AS (SELECT *, len(tokens) AS n_tok FROM toks),
c AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok AS start
  FROM sized),
packed AS (
  SELECT source, CAST(floor(start / {_TOK_CTX}.0) AS BIGINT) AS pack_id,
         doc_id, tokens, n_tok
  FROM c)
SELECT source, pack_id,
       md5(array_to_string(list_transform(flatten(list(tokens ORDER BY doc_id)),
                                          x -> CAST(x AS VARCHAR)), ',')) AS pack_md5,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tok
FROM packed GROUP BY 1, 2
"""


QUERIES = {"pack_sequences": q_pack_sequences, "pack_tokens": q_pack_tokens}
ORACLES = {"pack_sequences": ORACLE_PACK, "pack_tokens": ORACLE_PACK_TOKENS}
