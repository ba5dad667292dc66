"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries aren't in this container, so the decode
kernel is a clearly-marked deterministic fake — but the Spark-side plumbing
is real and oracle-checked: binary column schema, Arrow batch shape through
mapInPandas, vectorized metadata extraction, and the partition-friendly
(n_bytes-derived) outputs. Swap `_fake_decode` for a PIL/ffmpeg call and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spread import spread

DECODED_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _fake_decode(payload_lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """DETERMINISTIC FAKE of an image/video decode — stands in for the real
    codec (not installed here). Metadata derives only from byte length, so
    the DuckDB oracle can verify the plumbing end-to-end. Replace with e.g.
    PIL.Image.open(io.BytesIO(buf)).size in a real deployment."""
    width = payload_lengths % 640 + 1
    height = (payload_lengths * 7) % 480 + 1
    n_frames = payload_lengths // 1000 + 1
    return width, height, n_frames


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        lens = np.fromiter(
            (len(b) for b in pdf["payload"]), dtype=np.int64, count=len(pdf)
        )
        width, height, n_frames = _fake_decode(lens)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": lens,
                "width": width,
                "height": height,
                "n_frames": n_frames,
            }
        )


def q_multimodal_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-payload pipeline: text → binary column (stands in for an image
    blob), mapInPandas decode (Arrow binary batches), metadata out. At scale
    the binary column lives in its own parquet column chunk and the decode
    is the only stage that touches it (column pruning keeps it off every
    other operator's wire)."""
    from .dedup import ensure_workers_can_import

    ensure_workers_can_import(spark)
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_decode_batches, schema=DECODED_META)


ORACLE_MULTIMODAL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 + 1 AS width,
       (octet_length(encode(text)) * 7) % 480 + 1 AS height,
       octet_length(encode(text)) // 1000 + 1 AS n_frames
FROM documents
"""


def q_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling plumbing: explode a deterministic frame index list per
    payload (every 5th frame) — the shape of video-frame extraction with the
    decode stubbed."""
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    n_frames = F.octet_length(F.encode(F.col("text"), "utf-8")) / F.lit(1000)
    frames = F.sequence(F.lit(0), n_frames.cast("long"), F.lit(1))
    sampled = F.filter(frames, lambda i: i % 5 == 0)
    return d.select(
        "doc_id", F.explode(sampled).alias("frame_idx")
    )


ORACLE_FRAME_SAMPLE = """
SELECT doc_id, unnest(list_filter(range(0, octet_length(encode(text)) // 1000 + 1, 1),
                                  i -> i % 5 = 0)) AS frame_idx
FROM documents
"""


RESIZE_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("out_bytes", T.LongType()),
    ]
)

_TARGET_W, _TARGET_H = 224, 224


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        lens = np.fromiter(
            (len(b) for b in pdf["payload"]), dtype=np.int64, count=len(pdf)
        )
        width, height, _ = _fake_decode(lens)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "out_w": np.full(len(pdf), _TARGET_W, dtype=np.int64),
                "out_h": np.full(len(pdf), _TARGET_H, dtype=np.int64),
                # raw double ratios of exact ints: bit-identical on both engines
                "scale_x": _TARGET_W / width.astype(np.float64),
                "scale_y": _TARGET_H / height.astype(np.float64),
                "out_bytes": np.full(len(pdf), _TARGET_W * _TARGET_H * 3, dtype=np.int64),
            }
        )


def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Resize plumbing: decode dims (stubbed) → fixed 224×224 target with
    per-image scale factors and output byte budget — the shape of an image
    resize stage with the pixel work stubbed (swap the kernel body for
    PIL.Image.resize; the Arrow batch contract is identical)."""
    from .dedup import ensure_workers_can_import

    ensure_workers_can_import(spark)
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(_resize_batches, schema=RESIZE_META)


ORACLE_RESIZE = f"""
WITH dims AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 + 1 AS width,
         (octet_length(encode(text)) * 7) % 480 + 1 AS height
  FROM documents)
SELECT doc_id, {_TARGET_W} AS out_w, {_TARGET_H} AS out_h,
       {_TARGET_W} / CAST(width AS DOUBLE) AS scale_x,
       {_TARGET_H} / CAST(height AS DOUBLE) AS scale_y,
       {_TARGET_W * _TARGET_H * 3} AS out_bytes
FROM dims
"""


FEATURE_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("first_b", T.LongType()),
        T.StructField("last_b", T.LongType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature extraction over the REAL payload bytes, vectorized: one
    concatenated buffer + reduceat per batch — no per-row Python beyond the
    join of the already-materialized byte objects."""
    for pdf in batches:
        bufs = list(pdf["payload"])
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
        starts = np.zeros(len(bufs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        nonempty = lens > 0
        sums = np.zeros(len(bufs), dtype=np.int64)
        first = np.zeros(len(bufs), dtype=np.int64)
        last = np.zeros(len(bufs), dtype=np.int64)
        if nonempty.any():
            sums[nonempty] = np.add.reduceat(flat, starts[nonempty])
            first[nonempty] = flat[starts[nonempty]]
            last[nonempty] = flat[(starts + lens)[nonempty] - 1]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": lens,
                "byte_sum": sums,
                "first_b": first,
                "last_b": last,
            }
        )


def q_multimodal_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-extraction plumbing over the actual payload BYTES (not just
    their length): per-payload byte sum / boundary bytes via one
    concatenated-buffer reduceat per Arrow batch. Swap the stats for a real
    embedding model's forward pass; the batch contract is identical. Oracle
    note: the corpus is ASCII, where DuckDB's per-char code points equal
    utf-8 bytes."""
    from .dedup import ensure_workers_can_import

    ensure_workers_can_import(spark)
    d = spread(spark.read.parquet(f"{sf}/documents.parquet"))
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_META)


ORACLE_FEATURE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(coalesce(list_reduce(list_transform(string_split(text, ''), c -> unicode(c)),
                                 (a, b) -> a + b), 0) AS BIGINT) AS byte_sum,
       CAST(coalesce(unicode(substr(text, 1, 1)), 0) AS BIGINT) AS first_b,
       CAST(coalesce(unicode(substr(text, -1, 1)), 0) AS BIGINT) AS last_b
FROM documents
"""


QUERIES = {
    "multimodal_decode_meta": q_multimodal_decode_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_feature_extract": q_multimodal_feature_extract,
}

ORACLES = {
    "multimodal_decode_meta": ORACLE_MULTIMODAL,
    "multimodal_frame_sample": ORACLE_FRAME_SAMPLE,
    "multimodal_resize": ORACLE_RESIZE,
    "multimodal_feature_extract": ORACLE_FEATURE,
}
