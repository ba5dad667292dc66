"""Source-partitioned encode with explicit salted repartitioning.

The token table's ``source`` key is heavily skewed (FIXTURES.md §0: one
value carries ~60% of rows). Organizing the encoded output by source (so a
reader can prune to one source) with a naive ``repartition("source")``
would put 60% of all data in ONE task — the straggler that caps scaling at
any cluster size. North rule: handle this with explicit salting, not hope.

Plan shape:
    salt   = crc32(doc_id) % n_salts          (deterministic → stable resume)
    bucket = source || "_s" || salt
    df.repartition(n_buckets, "bucket") → mapInArrow encode → per-bucket
    commit (same atomic rename + manifest protocol as the per-file job)

n_salts bounds the largest bucket at ~60%/n_salts of the data; AQE's
skew-join handling does not apply here (no join), so the salt IS the
mechanism. Salting is deterministic on doc_id, so a resumed run reproduces
identical buckets byte-for-byte.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import zlib

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .pipeline import (
    _EXTRA_SPARK_TYPES,
    META_SCHEMA,
    _commit_file,
    _make_encode_fn,
    read_manifest,
    write_layout,
    write_token_sidecar,
)
from .tokfilter import merge_token_filters


def _input_snapshot(files: list[str]) -> dict:
    def sig_of(f: str) -> str:
        st = os.stat(f)
        return f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}"

    sig = zlib.crc32("|".join(sig_of(f) for f in sorted(files)).encode())
    return {"n_files": len(files), "crc": sig}


def encode_dataset_by_source(
    spark: SparkSession,
    input_path: str | list[str],
    out_dir: str,
    n_salts: int = 8,
    zstd: bool = True,
    zstd_level: int = 3,
) -> dict:
    """Encode the token table into source-partitioned, salt-balanced buckets.

    Resume unit = (source, salt) bucket; the input snapshot covers the whole
    input set (a changed input invalidates all buckets — coarse but exact).
    """
    t0 = time.time()
    files = (
        sorted(input_path)
        if isinstance(input_path, list)
        else sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    )
    if not files:
        raise ValueError(f"no parquet files under {input_path}")
    snapshot = _input_snapshot(files)
    done = {
        stem: rec
        for stem, rec in read_manifest(out_dir).items()
        if rec.get("snapshot") == snapshot
    }
    staging_dir = os.path.join(out_dir, "_staging")

    # the bucket universe is data-dependent: a complete prior run records it
    # in a job summary, so "all buckets committed" is decidable on resume
    # even when individual manifests were lost
    job_path = os.path.join(out_dir, "_manifest", "_job.json")
    expected: list[str] | None = None
    if os.path.exists(job_path):
        with open(job_path) as f:
            job = json.load(f)
        if job.get("snapshot") == snapshot and job.get("n_salts") == n_salts:
            expected = job["buckets"]
    metrics = {"buckets_skipped": len(done)}

    df = spark.read.parquet(*files)
    core = {"doc_id", "tokens", "n_tok", "source"}
    extras = sorted(
        (f.name, f.dataType.typeName()) for f in df.schema.fields if f.name not in core
    )
    for name, t in extras:
        if t not in _EXTRA_SPARK_TYPES:
            raise ValueError(f"unsupported extra column {name!r} of type {t!r}")
    bucket = F.concat(
        F.col("source"),
        F.lit("_s"),
        F.lpad((F.crc32(F.col("doc_id").cast("binary")) % n_salts).cast("string"), 3, "0"),
    )
    df = df.withColumn("_bucket", bucket)
    if expected is not None and all(b in done for b in expected):
        todo_df = None
    elif done:
        todo_df = df.filter(~F.col("_bucket").isin(list(done)))
    else:
        todo_df = df

    if todo_df is not None:
        if os.path.exists(staging_dir):
            shutil.rmtree(staging_dir)
        os.makedirs(staging_dir, exist_ok=True)
        # the explicit salted repartition: one shuffle, buckets ≈ balanced.
        # sortWithinPartitions keeps each bucket contiguous (interleaved
        # buckets fragment encode chunks → per-chunk overhead ruins the
        # ratio) and makes chunk boundaries deterministic after the shuffle.
        write_layout(out_dir, "by-source", extras=[list(e) for e in extras])
        par = spark.sparkContext.defaultParallelism
        n_buckets_hint = max(par, n_salts)
        shuffled = todo_df.repartition(n_buckets_hint, "_bucket").sortWithinPartitions(
            "_bucket", "doc_id"
        )
        meta_rows = shuffled.mapInArrow(
            _make_encode_fn(
                staging_dir, zstd, zstd_level, key="_bucket",
                extras=[n for n, _ in extras],
            ),
            schema=META_SCHEMA,
        ).collect()
        by_bucket: dict[str, list] = {}
        for r in meta_rows:
            by_bucket.setdefault(r["file_stem"], []).append(r)
        for stem, rows in by_bucket.items():
            codecs: dict[str, int] = {}
            for r in rows:
                for k, v in json.loads(r["codecs_json"]).items():
                    codecs[k] = codecs.get(k, 0) + v
            checksum = 0
            for r in rows:
                checksum ^= r["checksum"]
            rec = {
                "file_stem": stem,
                "source": stem.rsplit("_s", 1)[0],
                "salt": int(stem.rsplit("_s", 1)[1]),
                "n_parts": len(rows),
                "n_chunks": sum(r["n_chunks"] for r in rows),
                "n_docs": sum(r["n_docs"] for r in rows),
                "n_tokens": sum(r["n_tokens"] for r in rows),
                "bytes_in": sum(r["bytes_in"] for r in rows),
                "bytes_out": sum(r["bytes_out"] for r in rows),
                "checksum": checksum,
                "codecs": codecs,
                "doc_id_min": min(
                    (r["doc_id_min"] for r in rows if r["doc_id_min"]), default=None
                ),
                "doc_id_max": max(
                    (r["doc_id_max"] for r in rows if r["doc_id_max"]), default=None
                ),
                # same file-level zones as the per-file layout: length
                # bounds (length-bucketed reads) and token value bounds
                # (content reads) prune salted partitions from the manifest
                "n_tok_min": min(
                    (r["n_tok_min"] for r in rows if r["n_tok_min"] is not None),
                    default=None,
                ),
                "n_tok_max": max(
                    (r["n_tok_max"] for r in rows if r["n_tok_max"] is not None),
                    default=None,
                ),
                "tok_min": min(
                    (r["tok_min"] for r in rows if r["tok_min"] is not None),
                    default=None,
                ),
                "tok_max": max(
                    (r["tok_max"] for r in rows if r["tok_max"] is not None),
                    default=None,
                ),
                "snapshot": snapshot,
                "committed_at": time.time(),
            }
            # sidecar only when EVERY part carried a filter — a partial OR
            # would be a false negative (same rule as the per-file layout)
            if rows and all(r["tok_filter"] is not None for r in rows):
                write_token_sidecar(
                    out_dir,
                    stem,
                    merge_token_filters([bytes(r["tok_filter"]) for r in rows]),
                )
                rec["tok_filter"] = True
            _commit_file(out_dir, staging_dir, stem, rec)
        shutil.rmtree(staging_dir, ignore_errors=True)
        # job summary: the complete bucket universe for this snapshot
        all_buckets = sorted(set(done) | set(by_bucket))
        tmp = job_path + ".tmp"
        os.makedirs(os.path.dirname(job_path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {"snapshot": snapshot, "n_salts": n_salts, "buckets": all_buckets}, f
            )
        os.rename(tmp, job_path)

    manifest = read_manifest(out_dir)
    manifest.pop("_job", None)
    metrics["buckets_total"] = len(manifest)
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
    # skew evidence: the largest bucket's share of tokens (unsalted, the
    # head source alone would be ~0.6)
    if manifest:
        big = max(r["n_tokens"] for r in manifest.values())
        metrics["max_bucket_token_share"] = big / max(metrics["n_tokens"], 1)
    metrics["wall_s"] = time.time() - t0
    metrics["tokens_per_s"] = metrics["n_tokens"] / metrics["wall_s"]
    return metrics
