"""Spark encode/decode pipeline with per-file lineage manifest and resume.

Shape mirrors the reference's chunked streaming + incremental-write design
(/root/reference/src/streaming_processor.py:94-263,
 /root/reference/src/aggregator_ocp_aws.py:307-350) re-expressed Spark-first:

  * the "chunk" is an Arrow batch inside ``mapInPandas`` (vectorized, no
    per-row Python — BASELINE.json input_hint);
  * the resume unit is the INPUT FILE: each completed file's encoded chunks
    are committed by an atomic directory rename plus an atomically-renamed
    manifest JSON (input snapshot, per-stream codecs, checksum, bytes in/out)
    — the Spark-native form of the reference's per-chunk incremental DB
    writes with exact resume;
  * at cluster scale the same commit protocol is an Iceberg snapshot commit;
    local FS rename stands in for it here.

Correctness: ``decode_verify`` decodes every partition and asserts
bit-identical token-array equality against the source via a full outer join
on doc_id (the reference's expected-results oracle discipline,
/root/reference/src/expected_results.py:309-431).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs.strings import decode_strings, encode_strings_auto
from ..codecs.ints import wrap_zstd, unwrap_zstd
from ..codecs.strings import STR_CODEC_NAMES
from .chunk import decode_token_chunk, encode_token_chunk

ENC_SCHEMA = T.StructType(
    [
        T.StructField("file_stem", T.StringType(), False),
        T.StructField("chunk_crc", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("bytes_in", T.LongType(), False),
        T.StructField("bytes_out", T.LongType(), False),
        T.StructField("doc_id_blob", T.BinaryType(), False),
        T.StructField("source_blob", T.BinaryType(), False),
        T.StructField("tokens_blob", T.BinaryType(), False),
        T.StructField("meta_json", T.StringType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _flatten_tokens(series: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """pandas Series of np.int32 arrays → (flat, lengths), no per-row Python
    beyond the zero-copy np.concatenate gather."""
    arrays = series.to_numpy()
    lengths = np.fromiter((len(a) for a in arrays), dtype=np.int32, count=len(arrays))
    flat = (
        np.concatenate(arrays).astype(np.int32, copy=False)
        if len(arrays)
        else np.zeros(0, np.int32)
    )
    return flat, lengths


def _encode_batches(batches: Iterator[pd.DataFrame], zstd: bool) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        # a batch can straddle input files only at file-split edges; group to
        # keep the file_stem → chunks mapping exact for per-file commit
        for fname, part in pdf.groupby("_file", sort=False):
            flat, lengths = _flatten_tokens(part["tokens"])
            n_tok = part["n_tok"].to_numpy().astype(np.int32)
            # invariant from input_hint: n_tok == len(tokens); enforced here
            assert np.array_equal(n_tok, lengths), "n_tok invariant violated"
            tokens_blob, meta = encode_token_chunk(flat, lengths, zstd=zstd)
            doc_ids = part["doc_id"].tolist()
            sources = part["source"].tolist()
            did_blob, did_codec = encode_strings_auto(doc_ids)
            src_blob, src_codec = encode_strings_auto(sources)
            if zstd:
                did_blob, src_blob = wrap_zstd(did_blob), wrap_zstd(src_blob)
            meta["streams"]["doc_id"] = STR_CODEC_NAMES[did_codec]
            meta["streams"]["source"] = STR_CODEC_NAMES[src_codec]
            bytes_in = int(
                4 * len(flat)
                + 4 * len(lengths)
                + sum(len(s.encode()) for s in doc_ids)
                + sum(len(s.encode()) for s in sources)
            )
            bytes_out = len(tokens_blob) + len(did_blob) + len(src_blob)
            crc = zlib.crc32(flat.tobytes()) ^ zlib.crc32("".join(doc_ids).encode())
            yield pd.DataFrame(
                {
                    "file_stem": [_stem(fname)],
                    "chunk_crc": [crc],
                    "n_docs": [len(lengths)],
                    "n_tokens": [len(flat)],
                    "bytes_in": [bytes_in],
                    "bytes_out": [bytes_out],
                    "doc_id_blob": [did_blob],
                    "source_blob": [src_blob],
                    "tokens_blob": [tokens_blob],
                    "meta_json": [json.dumps(meta["streams"], sort_keys=True)],
                }
            )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for _, row in pdf.iterrows():  # ≤ a few chunk rows per batch — not a hot loop
            flat, lengths = decode_token_chunk(bytes(row["tokens_blob"]))
            doc_ids = decode_strings(unwrap_zstd(bytes(row["doc_id_blob"])))
            sources = decode_strings(unwrap_zstd(bytes(row["source_blob"])))
            offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(len(lengths))]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "tokens": tokens,
                    "n_tok": lengths.astype(np.int32),
                    "source": sources,
                }
            )


# ----------------------------------------------------------------- manifest


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(out_dir: str) -> dict[str, dict]:
    records = {}
    for p in glob.glob(os.path.join(_manifest_dir(out_dir), "*.json")):
        with open(p) as f:
            rec = json.load(f)
        records[rec["file_stem"]] = rec
    return records


def _snapshot(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "path": path}


def _commit_file(
    out_dir: str, staging_dir: str, stem: str, record: dict
) -> None:
    """Atomic per-file commit: rename encoded-chunk dir into place, then
    rename the manifest record into place. A crash between the two renames
    leaves data without manifest → file re-encoded next run (idempotent:
    target dir is replaced)."""
    src = os.path.join(staging_dir, f"file_stem={stem}")
    dst = os.path.join(out_dir, "data", f"file_stem={stem}")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(src, dst)
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{stem}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
    os.rename(tmp, os.path.join(mdir, f"{stem}.json"))


# ---------------------------------------------------------------- encode job


def encode_dataset(
    spark: SparkSession,
    input_path: str | list[str],
    out_dir: str,
    zstd: bool = True,
) -> dict:
    """Encode all input parquet files, skipping files already committed with
    a matching input snapshot. Returns job metrics."""
    t0 = time.time()
    files = (
        sorted(input_path)
        if isinstance(input_path, list)
        else sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    )
    if not files:
        raise ValueError(f"no parquet files under {input_path}")
    done = read_manifest(out_dir)
    todo = [
        f
        for f in files
        if _stem(f) not in done
        or done[_stem(f)].get("snapshot", {}).get("size") != os.stat(f).st_size
    ]
    metrics = {
        "files_total": len(files),
        "files_skipped": len(files) - len(todo),
        "files_encoded": len(todo),
    }
    staging_dir = os.path.join(out_dir, "_staging")
    if todo:
        if os.path.exists(staging_dir):
            shutil.rmtree(staging_dir)
        df = spark.read.parquet(*todo).withColumn("_file", F.input_file_name())
        enc = df.mapInPandas(
            lambda it: _encode_batches(it, zstd), schema=ENC_SCHEMA
        )
        # blobs are already codec/zstd-compressed → store pages uncompressed
        # so encoded size is honest (no double compression credit)
        (
            enc.write.option("compression", "uncompressed")
            .partitionBy("file_stem")
            .mode("overwrite")
            .parquet(staging_dir)
        )
        # commit per file: aggregate chunk metrics from the staging data
        agg = (
            spark.read.parquet(staging_dir)
            .groupBy("file_stem")
            .agg(
                F.count("*").alias("n_chunks"),
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.sum("bytes_in").alias("bytes_in"),
                F.sum("bytes_out").alias("bytes_out"),
                # order-insensitive combined checksum
                F.expr("cast(aggregate(collect_list(chunk_crc), 0L, (a, x) -> a ^ x) as long)").alias(
                    "checksum"
                ),
            )
            .collect()
        )
        by_stem = {f"{_stem(f)}": f for f in todo}
        for row in agg:
            rec = row.asDict()
            rec["file_stem"] = str(rec["file_stem"])
            rec["snapshot"] = _snapshot(by_stem[rec["file_stem"]])
            rec["committed_at"] = time.time()
            _commit_file(out_dir, staging_dir, rec["file_stem"], rec)
        shutil.rmtree(staging_dir, ignore_errors=True)

    manifest = read_manifest(out_dir)
    metrics["n_docs"] = sum(r["n_docs"] for r in manifest.values())
    metrics["n_tokens"] = sum(r["n_tokens"] for r in manifest.values())
    metrics["bytes_in"] = sum(r["bytes_in"] for r in manifest.values())
    metrics["bytes_out"] = sum(r["bytes_out"] for r in manifest.values())
    metrics["input_parquet_bytes"] = sum(os.stat(f).st_size for f in files)
    data_dir = os.path.join(out_dir, "data")
    metrics["encoded_parquet_bytes"] = sum(
        os.stat(p).st_size
        for p in glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    metrics["ratio_vs_parquet_zstd"] = (
        metrics["encoded_parquet_bytes"] / metrics["input_parquet_bytes"]
    )
    metrics["wall_s"] = time.time() - t0
    metrics["tokens_per_s"] = (
        metrics["n_tokens"] / metrics["wall_s"] if metrics["wall_s"] else 0.0
    )
    return metrics


def read_decoded(spark: SparkSession, out_dir: str) -> DataFrame:
    enc = spark.read.parquet(os.path.join(out_dir, "data"))
    return enc.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


def decode_verify(spark: SparkSession, input_path: str | list[str], out_dir: str) -> dict:
    """Decode every partition, full-outer-join on doc_id against the source,
    assert bit-identical tokens + n_tok + source. Returns counts."""
    files = (
        sorted(input_path)
        if isinstance(input_path, list)
        else sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    )
    src = spark.read.parquet(*files)
    dec = read_decoded(spark, out_dir)
    joined = src.alias("s").join(dec.alias("d"), "doc_id", "full_outer")
    status = joined.select(
        F.when(F.col("s.n_tok").isNull() | F.col("d.n_tok").isNull(), "missing")
        .when(
            (F.col("s.tokens") == F.col("d.tokens"))
            & (F.col("s.n_tok") == F.col("d.n_tok"))
            & (F.col("s.source") == F.col("d.source")),
            "ok",
        )
        .otherwise("mismatch")
        .alias("status")
    )
    counts = {r["status"]: r["cnt"] for r in status.groupBy("status").agg(F.count("*").alias("cnt")).collect()}
    counts.setdefault("ok", 0)
    counts.setdefault("mismatch", 0)
    counts.setdefault("missing", 0)
    counts["bit_identical"] = counts["mismatch"] == 0 and counts["missing"] == 0
    return counts
