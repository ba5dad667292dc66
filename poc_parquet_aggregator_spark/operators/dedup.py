"""Deduplication operators over the documents/embeddings tables.

Training-data-pipeline extensions beyond the reference's inventory:
exact-hash dedup, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
near-dup. All portable math (md5-based hashing, left-to-right array sums)
so the DuckDB oracles compute identical values; SimHash needs bit ops that
don't map cleanly to ANSI SQL → no oracle (driver records rows-only).

Scale notes (100 TB): every operator here is shuffle-on-key (shingle /
band / bucket), never a cross join; candidate verification happens only
within buckets, which is the LSH contract. The only broadcast is the tiny
hash-seed dimension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spread import spread


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spread(spark.read.parquet(f"{sf}/documents.parquet"))


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to python workers via addPyFile — covers harnesses
    that built their SparkSession before this package hit PYTHONPATH (the
    env-var route in __spark_entry__ only works pre-JVM)."""
    sid = id(spark.sparkContext)
    if getattr(ensure_workers_can_import, "_done", None) == sid:
        return
    import os
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = "/tmp/poc_parquet_aggregator_spark_pyfiles.zip"
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    ensure_workers_can_import._done = sid


# ─────────────────────────── exact dedup (hash groupBy) ─────────────────────


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on whitespace-normalized text: one shuffle on the content
    hash; representatives = min(doc_id). At scale: hash is computed in the
    scan project, groupBy benefits from partial aggregation."""
    d = _docs(spark, sf)
    norm = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    return (
        d.withColumn("content_hash", norm)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_copies"))
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS kept_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


# ─────────────────────── n-gram Jaccard near-dup ────────────────────────────


def _shingles(d: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc via JVM-side array ops —
    explode is the distributed form; no Python in the hot path."""
    words = F.split(F.lower(F.regexp_replace("text", r"\s+", " ")), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return d.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Jaccard over 3-gram shingle sets: |A∩B| via shingle self-join
    (shuffle on shingle — the inverted-index plan), sizes joined in, pairs
    with J ≥ 0.5. The shingle join is the scalable core: no doc×doc cross
    product ever materializes."""
    d = _docs(spark, sf)
    sh = _shingles(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


ORACLE_NGRAM_JACCARD = """
WITH words AS (
  SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g AS shingle
  FROM words,
       LATERAL (SELECT unnest(list_transform(
                  range(1, greatest(len(w) - 3, 0) + 2),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS g)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
"""


# ───────────────────────────── MinHash + LSH ────────────────────────────────

_N_HASHES = 8
_BAND_SIZE = 2  # 4 bands of 2 → candidates sharing any band


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures (min over md5(seed||shingle) — portable string-min
    MinHash), banded LSH bucketing, candidate pairs from same-band buckets,
    verified with exact Jaccard. Shuffles: shingle→doc agg, band bucket join.
    This is the 100 TB path: doc×doc never materializes; bucket sizes bound
    the join."""
    d = _docs(spark, sf)
    sh = _shingles(d)
    sig_cols = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"s{i}")
        for i in range(_N_HASHES)
    ]
    sigs = sh.groupBy("doc_id").agg(*sig_cols)
    # one band row per (doc, band) via a single explode — a union of N
    # projections would rescan/reaggregate the signature pipeline N times
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.col(f"s{b * _BAND_SIZE + j}") for j in range(_BAND_SIZE)],
                ).alias("band_key"),
            )
            for b in range(_N_HASHES // _BAND_SIZE)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    a = banded.alias("a")
    b2 = banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return cand


ORACLE_MINHASH_LSH = """
WITH words AS (
  SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g AS shingle
  FROM words,
       LATERAL (SELECT unnest(list_transform(
                  range(1, greatest(len(w) - 3, 0) + 2),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS g)),
sigs AS (
  SELECT doc_id,
         min(md5('0|' || shingle)) AS s0, min(md5('1|' || shingle)) AS s1,
         min(md5('2|' || shingle)) AS s2, min(md5('3|' || shingle)) AS s3,
         min(md5('4|' || shingle)) AS s4, min(md5('5|' || shingle)) AS s5,
         min(md5('6|' || shingle)) AS s6, min(md5('7|' || shingle)) AS s7
  FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band, s0 || '|' || s1 AS band_key FROM sigs UNION ALL
  SELECT doc_id, 1, s2 || '|' || s3 FROM sigs UNION ALL
  SELECT doc_id, 2, s4 || '|' || s5 FROM sigs UNION ALL
  SELECT doc_id, 3, s6 || '|' || s7 FROM sigs)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


# ──────────────────────────────── SimHash ───────────────────────────────────


_SIMHASH_BITS = 64


def _simhash_batch(batches):
    """64-bit SimHash per doc over word tokens, vectorized per Arrow batch
    (tokens hashed with a splitmix64-style mix; bit-majority voting via a
    numpy histogram — no per-row Python beyond the tokenize split)."""
    for pdf in batches:
        out_rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = np.array(
                [hash_str(w) for w in str(text).lower().split()], dtype=np.uint64
            )
            if len(toks) == 0:
                out_rows.append((doc_id, 0))
                continue
            bits = (toks[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 > len(toks)
            sim = int(np.packbits(votes[::-1]).view(">u8")[0])
            out_rows.append((doc_id, sim - (1 << 63)))  # store as signed i64
        yield pd.DataFrame(out_rows, columns=["doc_id", "simhash"])


def hash_str(w: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a) — stable across workers,
    unlike Python's builtin hash."""
    h = 0xCBF29CE484222325
    for ch in w.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup: signature via mapInPandas (Arrow batches), then
    pairs within Hamming distance ≤ 3 found by the 4-table pigeonhole trick
    (split 64 bits into 4 × 16-bit keys; near-dups share ≥1 exact key) —
    bucket join, no cross product. No SQL oracle (bit ops) → rows-only check.
    """
    ensure_workers_can_import(spark)
    d = _docs(spark, sf)
    sigs = d.mapInPandas(
        _simhash_batch,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("simhash", T.LongType()),
            ]
        ),
    )
    # 4 pigeonhole keys per doc in ONE pass (explode, not a 4-way union that
    # would run the mapInPandas signature job 4 times — seen in .explain)
    slots = F.array(
        *[
            F.struct(
                F.lit(i).alias("slot"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(4)
        ]
    )
    keyed = sigs.select("doc_id", "simhash", F.explode(slots).alias("sk")).select(
        "doc_id", "simhash", F.col("sk.slot").alias("slot"), F.col("sk.key").alias("key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# ───────────────────── embedding-cosine near-dup ────────────────────────────


def q_dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup candidates by cosine ≥ 0.35 over the embedding column (the
    synthetic embeddings are near-orthogonal random vectors, so a
    production-style 0.9 threshold returns an empty — hence untested —
    result; 0.35 ≈ 2.8σ keeps a few hundred verifiable pairs). Exact pairwise
    here (oracle-checkable); the scalable LSH-bucketed variant is
    similarity.q_ann_lsh. Dot products via F.aggregate/zip_with — JVM-side,
    left-to-right sum order matches DuckDB's list_* functions exactly."""
    e = spread(spark.read.parquet(f"{sf}/embeddings.parquet"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e2 = e.select("vec_id", v.alias("v"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )
    a, b = e2.alias("a"), e2.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v"))) * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    # raw double: both engines fold left-to-right → bit-identical cosines;
    # fractional round() would be LESS portable (string-vs-binary rounding)
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cos.alias("cosine"),
    ).filter(F.col("cosine") >= 0.35)


_DDOT = "list_reduce(list_transform(list_zip({x}, {y}), p -> p[1] * p[2]), (a, b) -> a + b)"
_DCOS = (
    f"({_DDOT.format(x='a.v', y='b.v')} / "
    f"(sqrt({_DDOT.format(x='a.v', y='a.v')}) * sqrt({_DDOT.format(x='b.v', y='b.v')})))"
)

ORACLE_EMB_COSINE = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_DCOS} AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_DCOS} >= 0.35
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
    "dedup_embedding_cosine": ORACLE_EMB_COSINE,
    # dedup_simhash: bit-level ops → no portable SQL oracle (rows-only)
}
