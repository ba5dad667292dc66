"""Benchmark decontamination: remove training documents that near-duplicate
an evaluation set.

The standard last gate of an LLM training-data pipeline — eval benchmarks
leak into web-scale corpora, and a model must not train on its test set —
and a capability the reference engine (a cost aggregator) has no analog
for.  Structurally it is the BIPARTITE form of ``dedup.py``'s MinHash-LSH:
the same shingle → signature → band machinery on both frames, but a
cross-frame bucket join instead of a self-join, and the exact-Jaccard
verify runs train-doc × bench-doc only within shared buckets.

100 TB design: the asymmetry IS the plan.  A benchmark suite is thousands
of documents; the train corpus is the 100 TB side.  With
``broadcast_bench=True`` (default) the bench band frame AND the bench
shingle sets broadcast, so the train side never shuffles for the join at
all — its only wide stage is its own per-doc shingle aggregation, and
candidate verification is a map-side lookup against the broadcast sets.
Flip it off for bench sets beyond broadcast comfort (~tens of MB of
shingle sets) and the same plan runs as two shuffle-on-key joins.

Skew guards are inherited: the per-frame document-frequency cap bounds
shingle fan-out, and per-side band-bucket caps (``_MAX_BUCKET``) bound the
cross-join of any single degenerate bucket to cap² instead of |T|·|B|.

Reference citation (parity anchor, not a source): the reference's only
dedup is keep-last drop_duplicates inside src/aggregator.py — cross-corpus
contamination screening is beyond its inventory, which is why this lives
in the training-pipeline extension tier of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _MAX_BUCKET, _capped_shingles, _minhash_banded


def _doc_sets(d: DataFrame) -> DataFrame:
    """(doc_id, sh_set, n_sh) per-doc capped shingle sets — the exact
    frame contract _minhash_banded expects (built per input frame: the
    df cap is a per-corpus property, so train and bench each get their
    own)."""
    return (
        _capped_shingles(d)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh_set"))
        .withColumn("n_sh", F.size("sh_set"))
    )


def _capped_bands(sets: DataFrame) -> DataFrame:
    """Band rows minus degenerate buckets (> _MAX_BUCKET members on this
    SIDE) — the per-side cap bounds any one bucket's cross-side join to
    cap² pairs."""
    banded = _minhash_banded(sets)
    ok = (
        banded.groupBy("band", "band_key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= _MAX_BUCKET)
        .select("band", "band_key")
    )
    return banded.join(ok, ["band", "band_key"])


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(train_id, bench_id, jaccard) for every cross-frame pair that shares
    an LSH band bucket AND has exact shingle Jaccard ≥ ``threshold``.

    Both inputs are (doc_id, text, ...) frames.  Recall follows the LSH
    contract (4 bands of 2 over 8 min-hashes — detection probability
    1-(1-J²)⁴, ≈0.999 at J=0.9, ≈0.84 at J=0.6); precision is exact, every
    reported pair is verified with true Jaccard over the capped shingle
    sets.  Verification joins candidates back to BOTH sets frames
    row-wise via array_intersect — the same no-reshuffle discipline as
    q_dedup_minhash_lsh (dedup.py) — and the bench side of both joins
    broadcasts under the default asymmetry."""
    tsets = _doc_sets(train)
    bsets = _doc_sets(bench)
    wrap = F.broadcast if broadcast_bench else (lambda df: df)

    tb = _capped_bands(tsets).select(
        F.col("doc_id").alias("train_id"), "band", "band_key"
    )
    bb = _capped_bands(bsets).select(
        F.col("doc_id").alias("bench_id"), "band", "band_key"
    )
    cand = tb.join(wrap(bb), ["band", "band_key"]).select(
        "train_id", "bench_id"
    ).distinct()

    sa = tsets.select(
        F.col("doc_id").alias("train_id"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = bsets.select(
        F.col("doc_id").alias("bench_id"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(sa, "train_id")
        .join(wrap(sb), "bench_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("train_id", "bench_id", "jaccard")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The train frame minus every document contaminated by ``bench`` —
    a LEFT ANTI join against the report's distinct train ids, so the
    output schema is exactly the input's."""
    hits = contamination_report(
        train, bench, threshold=threshold, broadcast_bench=broadcast_bench
    ).select(F.col("train_id").alias("doc_id")).distinct()
    return train.join(hits, "doc_id", "left_anti")
