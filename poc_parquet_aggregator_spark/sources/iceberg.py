"""Iceberg table adapter for the encode pipeline.

The north rule targets "Iceberg tables of pre-tokenized training sequences".
This sandbox ships no iceberg-spark-runtime JAR, so the engine's resume unit
is the input *parquet file* and the atomic manifest rename stands in for the
Iceberg snapshot commit (encode/pipeline.py module doc). This module is the
seam where a real cluster plugs in:

* ``read_sequence_table(spark, ref)`` — one entry point for both worlds: a
  filesystem path reads partitioned parquet; a ``catalog.db.table``
  identifier reads through the session catalog (Iceberg when the runtime is
  on the classpath), optionally pinned to a snapshot for reproducible
  lineage (``VERSION AS OF`` — the table-format analog of the manifest's
  per-file ``snapshot`` record).
* ``iceberg_input_files(spark, ref)`` — the encode job's work list from the
  Iceberg ``<table>.files`` metadata table, so resume skips data files
  already committed, exactly as the glob does for directories.
* ``has_iceberg(spark)`` — runtime detection, so callers fail with a clear
  message instead of an opaque catalog error.

Reference analog: the POC lists partitioned S3 prefixes and tracks processed
chunks per source (/root/reference/src/aws_data_loader.py:354-366); Iceberg's
file-level metadata replaces prefix listing at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _is_path(ref: str) -> bool:
    return (
        os.path.sep in ref
        or ref.startswith(".")
        or "://" in ref
        or os.path.exists(ref)
    )


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_sequence_table(
    spark: SparkSession, ref: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the (doc_id, tokens, n_tok, source) sequence table.

    ``ref`` is a directory of parquet files (sandbox / plain-FS mode) or a
    table identifier resolved by the session catalog (Iceberg mode on a
    cluster). ``snapshot_id`` pins an Iceberg snapshot for exact-resume
    reproducibility; it is rejected in path mode where immutable input files
    plus the manifest's size/mtime snapshot give the same guarantee.
    """
    if _is_path(ref):
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg table identifier")
        return spark.read.parquet(ref)
    if snapshot_id is not None:
        if not has_iceberg(spark):
            raise RuntimeError(
                "snapshot pinning needs the Iceberg Spark runtime on the "
                "classpath (spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13)"
            )
        return spark.read.option("snapshot-id", str(snapshot_id)).table(ref)
    return spark.read.table(ref)


def iceberg_input_files(
    spark: SparkSession, ref: str, snapshot_id: int | None = None
) -> list[str]:
    """Data-file paths of an Iceberg table (the encode job's resume unit).

    Mirrors the directory glob in ``encode_dataset``: each returned path is
    one unit of work, committed atomically with its own lineage record.
    """
    if _is_path(ref):
        raise ValueError("iceberg_input_files takes a table identifier, not a path")
    if not has_iceberg(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; pass a parquet directory "
            "instead, or add iceberg-spark-runtime via spark-submit --packages"
        )
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    rows = reader.table(f"{ref}.files").select("file_path").collect()
    return sorted(r["file_path"] for r in rows)
