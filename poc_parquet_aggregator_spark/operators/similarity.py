"""Similarity search over the embeddings table (array<float>, 64-dim).

Brute-force cosine top-k is the correctness baseline (full oracle); the
scale path is IVF coarse quantization — assign vectors to their nearest
centroid, search only the probe's bucket. At 100 TB the IVF bucket column
becomes the table's partition key so a query touches one partition.

Dot products use F.zip_with + F.aggregate (JVM-side, left-to-right) so the
DuckDB oracle (list_reduce over list_zip) computes bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .spread import spread

_K = 10
_N_QUERIES = 5  # vec_id < 5 are the query vectors
_N_CENTROIDS = 8  # vec_id < 8 double as IVF centroids (deterministic)


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, v, nv) — corpus vectors with their norm hoisted to ONCE
    per vector row BEFORE any fan-out join (r5, same finding as the
    embedding-LSH verify): cosine per pair then costs one interpreted HOF
    dot instead of three. sqrt(dot(v,v)) is the same IEEE value wherever
    computed (identical input, identical left-to-right fold), so the
    DuckDB oracles keep their inline form unchanged."""
    e = spread(spark.read.parquet(f"{sf}/embeddings.parquet"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e2 = e.select("vec_id", v.alias("v"))
    return e2.withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v"))))


# no-init fold: v1+v2+… matches Spark's aggregate(0.0 + v1 + v2 + …) exactly
# (0.0 + x == x in IEEE), and DuckDB list_reduce folds left-to-right
_DUCK_DOT = (
    "list_reduce(list_transform(list_zip({x}, {y}), p -> p[1] * p[2]), (a, b) -> a + b)"
)


def _duck_cos(x: str, y: str) -> str:
    return (
        f"({_DUCK_DOT.format(x=x, y=y)} / "
        f"(sqrt({_DUCK_DOT.format(x=x, y=x)}) * sqrt({_DUCK_DOT.format(x=y, y=y)})))"
    )


# ─────────────────────── brute-force cosine top-k ───────────────────────────


def q_ann_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus —
    corpus-side scan stays partitioned, no shuffle until the per-query top-k
    window (k rows per query survive the partial sort)."""
    e = _emb(spark, sf)
    queries = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
        (F.col("vec_id") * 0).alias("_k"),
    )
    # column-derived-constant-key BroadcastHashJoin + post-filter (a
    # non-equi broadcast join would plan as BroadcastNestedLoopJoin; see
    # _rank_vs_centroids for why the key doesn't constant-fold)
    pairs = (
        e.withColumn("_k", F.col("vec_id") * 0)
        .join(F.broadcast(queries), "_k")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
    )


ORACLE_ANN_BRUTE = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_duck_cos('q.qv', 'e.v')} AS cosine
  FROM v e CROSS JOIN q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {_K}
"""


# ───────────────────── IVF-bucketed ANN, k-means-trained ────────────────────
#
# Round 3 upgrade (VERDICT r2 #5): the coarse quantizer is TRAINED — a
# fixed number of Lloyd iterations of k-means over a deterministic sample (vec_id <
# _TRAIN_N), initialized from the first 8 vectors. Everything stays
# oracle-expressible: assignment is argmax-cosine with a total tiebreak, and
# the centroid means are fixed-point (floor(x*1e6+0.5) BIGINT sums / count /
# 1e6) so both engines produce bit-identical centroid doubles regardless of
# partition order. At 100 TB this is exactly the production shape: k-means
# on a driver-scale sample, the trained centroids broadcast, one scan to
# bucket the corpus (the bucket id then becomes the table's partition key).

_N_PROBE = 2  # query-side multi-probe: search the 2 nearest buckets
_TRAIN_N = 256  # deterministic training sample: vec_id < 256
# Round-4 sweep (iters ∈ 0..4 × k ∈ {8,16} × nprobe ∈ {2,3}, sf0.1):
# recall@5 = 1.00 untrained → 0.96 @ 1 iter → 0.84 @ 2 → 0.68 @ 4 (k=16);
# nprobe changes nothing. On these NEAR-ORTHOGONAL synthetic embeddings
# Lloyd iterations collapse the centroids toward the corpus mean, so more
# training = blurrier partitions — the opposite of a clustered production
# corpus, where training is the win and this knob would go UP. One
# iteration keeps the full trained-quantizer machinery (and its SQL-replay
# oracle) while staying above the 0.92 untrained record from round 2; the
# measured recall curve is published in BENCH (ann_ivf_recall_curve).
_KMEANS_ITERS = 1
_DIM = 64


def _fx6(c: Column) -> Column:
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def _rank_vs_centroids(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, centroid_id, rn) — rn ranks centroids per vector by
    cosine (desc, centroid_id tiebreak). Centroids are broadcast. The join
    key is a column-derived constant (x*0 — Catalyst can't fold it because
    x*0 is NULL for NULL x) so the fan-out plans as BroadcastHashJoin; a
    bounded-build BNLJ would be equivalent at runtime, but keeping every
    executedPlan of the similarity/ANN family BNLJ-free makes the
    no-quadratic-join invariant mechanically checkable there (the
    relational theta joins j5/j11/j20 DO plan BNLJ — by design, against
    literal ≤3-row build sides)."""
    cents2 = cents.withColumn("ncv", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = (
        e.withColumn("_k", F.col("vec_id") * 0)
        .join(F.broadcast(cents2.withColumn("_k", F.col("centroid_id") * 0)), "_k")
        .select(
            "vec_id",
            "v",
            "nv",
            "centroid_id",
            (_dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("ncv"))).alias("csim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    return scored.withColumn("rn", F.row_number().over(w))


def _trained_centroids(e: DataFrame) -> list[tuple[int, list[float]]]:
    """_KMEANS_ITERS fixed k-means iterations on the vec_id < _TRAIN_N
    sample (1 since round 4 — see the recall-curve note above), computed
    DRIVER-SIDE since round 7: the sample is bounded at _TRAIN_N rows by
    construction (the module contract already frames training as "k-means
    on a driver-scale sample"), and the former DataFrame chain — sample
    assignment window + posexplode per-dim aggregation + join, per
    iteration — cost ~1 s of sequential stage latency per query on data
    that fits in one collect. Every arithmetic step replays Spark's exact
    IEEE operation sequence so the result is bit-identical to the old
    plan AND the DuckDB oracle: left-to-right dot folds (CPython float ==
    JVM double), cosine = dot/(nv·nc), ranking with Spark's
    NaN-is-greatest descending order and centroid_id tiebreak, and
    fixed-point means floor(x·1e6+0.5) summed exactly in Python ints then
    (double(sum)/double(count))/1e6; an emptied cluster keeps its
    previous centroid."""
    import math

    rows = (
        e.filter(F.col("vec_id") < _TRAIN_N)
        .select("vec_id", "v")
        .sort("vec_id")
        .collect()
    )
    sample = [list(r["v"]) for r in rows]
    ids = [r["vec_id"] for r in rows]
    cent_ids = [i for i in ids if i < _N_CENTROIDS]
    cents = [list(v) for i, v in zip(ids, sample) if i < _N_CENTROIDS]

    def fold_dot(x, y):
        acc = 0.0
        for a, b in zip(x, y):
            acc = acc + a * b
        return acc

    def better(cur, best):  # Spark: ORDER BY csim DESC — NaN sorts greatest
        if math.isnan(cur):
            return not math.isnan(best)  # NaN beats numbers; NaN tie → keep
        return (not math.isnan(best)) and cur > best

    for _ in range(_KMEANS_ITERS):
        norms_c = [math.sqrt(fold_dot(c, c)) for c in cents]
        sums = [[0] * len(c) for c in cents]
        counts = [0] * len(cents)
        for v in sample:
            nv = math.sqrt(fold_dot(v, v))
            best, best_i = None, None
            for ci, (c, nc) in enumerate(zip(cents, norms_c)):
                csim = fold_dot(v, c) / (nv * nc)
                if best is None or better(csim, best):
                    best, best_i = csim, ci
            counts[best_i] += 1
            row = sums[best_i]
            for d, x in enumerate(v):
                row[d] += int(math.floor(x * 1000000.0 + 0.5))
        cents = [
            [(float(s) / float(n)) / 1000000.0 for s in row] if n else c
            for c, row, n in zip(cents, sums, counts)
        ]
    return [(int(i), c) for i, c in zip(cent_ids, cents)]


def q_ann_ivf_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """IVF scale path with a trained coarse quantizer: corpus assigned to
    its nearest of 8 k-means centroids; each query MULTI-PROBES its
    _N_PROBE nearest buckets (nprobe is the standard recall knob). Recall <
    exact by design — the oracle recomputes the same algorithm, not exact
    kNN; bench.py reports measured recall@5 vs ann_topk_bruteforce."""
    e = _emb(spark, sf)
    # materialize the trained quantizer once: 8 rows × 64 doubles is a
    # driver-side DIMENSION (the production analog is loading centroids
    # from a model store). Left lazy, the deep k-means plan would re-execute
    # for every downstream consumer (assigned + queries → 2×) — measured 12 s
    # vs ~2 s at sf0.1.
    spark_ = e.sparkSession
    cents = spark_.createDataFrame(
        _trained_centroids(e), "centroid_id long, cv array<double>"
    )
    ranked = _rank_vs_centroids(e, cents)
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "v", "nv", "centroid_id"
    )
    queries = (
        ranked.filter((F.col("vec_id") < _N_QUERIES) & (F.col("rn") <= _N_PROBE))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.col("centroid_id").alias("qc"),
        )
    )
    bucket_pairs = assigned.join(
        F.broadcast(queries),
        (F.col("centroid_id") == F.col("qc")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored2 = bucket_pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored2.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= 5)


def _duck_kmeans_iter(prev: str, idx: int) -> str:
    """One Lloyd iteration as DuckDB CTEs: assign sample to ``prev``
    centroids, fixed-point per-dim means, empty-cluster coalesce."""
    return f"""
a{idx} AS (
  SELECT v, centroid_id FROM (
    SELECT s.v, c.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {_duck_cos('s.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM sample s CROSS JOIN {prev} c) WHERE rn = 1),
m{idx} AS (
  SELECT centroid_id, i AS dim,
         (sum(CAST(floor(v[CAST(i AS INTEGER)] * 1000000.0 + 0.5) AS BIGINT))
            / count(*)) / 1000000.0 AS cx
  FROM a{idx}, range(1, {_DIM + 1}) t(i) GROUP BY 1, 2),
n{idx} AS (SELECT centroid_id, list(cx ORDER BY dim) AS cv FROM m{idx} GROUP BY 1),
c{idx} AS (
  SELECT p.centroid_id, coalesce(n{idx}.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN n{idx} USING (centroid_id))"""


ORACLE_ANN_IVF = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < {_N_CENTROIDS}),
sample AS (SELECT vec_id, v FROM v WHERE vec_id < {_TRAIN_N}),
{",".join(_duck_kmeans_iter(f"c{i}", i + 1) for i in range(_KMEANS_ITERS))},
scored AS (
  SELECT e.vec_id, e.v, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_duck_cos('e.v', 'c.cv')} DESC, c.centroid_id) AS rn
  FROM v e CROSS JOIN c{_KMEANS_ITERS} c),
assigned AS (SELECT vec_id, v, centroid_id FROM scored WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, centroid_id AS qc
      FROM scored WHERE vec_id < {_N_QUERIES} AND rn <= {_N_PROBE}),
pairs AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {_duck_cos('q.qv', 'a.v')} AS cosine
  FROM assigned a JOIN q ON a.centroid_id = q.qc AND a.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


# ──────────────── IVF at the dedup_scale tier (bench evidence) ───────────────
#
# The gate query above pins nlist=8 for oracle parity. The SCALE
# configuration (VERDICT r5 #5) runs nlist ≈ √n — at 100k vectors that is
# ~316 centroids, where per-row interpreted HOF dots against every
# centroid stop being reasonable (31.6M 64-dim fold evaluations for one
# assignment pass). The scale path therefore assigns via an Arrow-batched
# numpy kernel: ONE (rows×64)·(64×nlist) GEMM per batch replaces nlist
# interpreted dots per row — the production IVF shape (BLAS assignment,
# centroid matrix broadcast once). Candidate scoring after the bucket
# join stays the engine's exact HOF cosine (the candidate set is tiny:
# nprobe·n/nlist per query), so recall@5 measured against
# q_ann_topk_bruteforce compares like with like. Centroids are the first
# nlist corpus vectors, untrained — the published recall curve
# (ann_ivf_recall_curve) shows Lloyd iterations blur partitions on these
# near-orthogonal synthetics; on a clustered production corpus the
# training knob goes up, not away. Bench-only: not oracle-paired (the
# GEMM's fused-multiply ordering differs from the HOF fold's, which only
# affects which bucket near-tie vectors land in — the gate query keeps
# the bit-exact oracle-checked path).


def _fast_assign(e: DataFrame, cents, nprobe: int) -> DataFrame:
    """(vec_id, centroid_id, rn ≤ min(nprobe, nlist)) via per-batch GEMM;
    ties broken by centroid_id ascending (stable argsort on the negated
    similarities, matching the engine's ORDER BY csim DESC, centroid_id).
    nprobe is clamped to the centroid count — there are only nlist
    centroids to probe (an unclamped slice built nprobe-sized index
    columns against nlist-wide rows and crashed the kernel whenever
    nlist < nprobe; review finding r6)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    p = min(nprobe, len(C))

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            sims = Vn @ Cn.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :p]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), p),
                    "centroid_id": top.reshape(-1).astype(np.int64),
                    "rn": np.tile(np.arange(1, p + 1), n),
                }
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("centroid_id", T.LongType()),
            T.StructField("rn", T.IntegerType()),
        ]
    )
    return e.select("vec_id", "v").mapInPandas(kern, schema=schema)


def _centroids(e: DataFrame, nlist: int) -> list:
    """The scale tier's centroid contract in ONE place (recall numbers and
    bucket-balance evidence must measure the same quantizer): first nlist
    corpus vectors, untrained — the published ann_ivf_recall_curve shows
    Lloyd iterations blur partitions on these near-orthogonal synthetics."""
    return [
        r["v"]
        for r in e.filter(F.col("vec_id") < nlist)
        .select("vec_id", "v")
        .sort("vec_id")
        .collect()
    ]


def ann_ivf_scale(
    spark: SparkSession, sf: str, nlist: int, nprobe: int = 2, k: int = 5
) -> DataFrame:
    """Scale-tier IVF top-k (see the block comment above): GEMM
    assignment, bucket join against broadcast multi-probed queries, exact
    HOF cosine on the surviving candidates.

    The corpus and query sides run SEPARATE assignment kernels: filters do
    not push through the opaque mapInPandas, so deriving the query probes
    from the full-corpus assign frame re-ran the whole GEMM pass per
    action (review finding r6).  The corpus side assigns at nprobe=1 (one
    home bucket per vector); the query side assigns only the _N_QUERIES
    pre-filtered rows at full nprobe — trivial work instead of a second
    corpus-wide pass, no persist needed."""
    from .dedup import ensure_workers_can_import

    ensure_workers_can_import(spark)
    e = _emb(spark, sf)
    cents = _centroids(e, nlist)
    assigned = _fast_assign(e, cents, 1).drop("rn")
    corpus_b = assigned.join(e, "vec_id")
    q_b = (
        _fast_assign(e.filter(F.col("vec_id") < _N_QUERIES), cents, nprobe)
        .drop("rn")
        .join(e, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.col("centroid_id").alias("qc"),
        )
    )
    bucket_pairs = corpus_b.join(
        F.broadcast(q_b),
        (F.col("centroid_id") == F.col("qc")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = bucket_pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_scale_bucket_sizes(spark: SparkSession, sf: str, nlist: int) -> DataFrame:
    """(n) bucket sizes of the scale-tier assignment — the balance
    evidence for the bench's ann_scale section."""
    from .dedup import ensure_workers_can_import

    ensure_workers_can_import(spark)
    e = _emb(spark, sf)
    return (
        _fast_assign(e, _centroids(e, nlist), 1)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .select("n")
    )


QUERIES = {
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "ann_ivf_kmeans": q_ann_ivf_kmeans,
}

ORACLES = {
    "ann_topk_bruteforce": ORACLE_ANN_BRUTE,
    "ann_ivf_kmeans": ORACLE_ANN_IVF,
}
