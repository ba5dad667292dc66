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

The caps create a recall hole EXACTLY where contamination is worst: a
benchmark text duplicated in more than ``_MAX_SHINGLE_DF`` train
documents loses every shingle to the train-side df cap (and past
``_MAX_BUCKET`` copies, every band bucket), so the most-leaked eval items
would silently evade the LSH path.  The report therefore always includes
an EXACT pre-pass — md5 of whitespace-normalized text (the same
normalization as ``q_dedup_exact``), bench hashes broadcast, reported as
jaccard 1.0 by definition — which no cap can drop: verbatim copies are
caught at any duplication level, map-side.  The residual loss is bounded
and characterizable: only NEAR-duplicate (mutated, not verbatim) bench
texts duplicated beyond the caps can still slip through, and each mutated
copy carries low-df shingles of its own that the LSH path does see.

Reference citation (parity anchor, not a source): the reference's only
dedup is keep-last drop_duplicates inside src/aggregator.py — cross-corpus
contamination screening is beyond its inventory, which is why this lives
in the training-pipeline extension tier of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _capped_shingles,
    _minhash_banded,
    doc_shingle_sets,
    drop_overcap_buckets,
)

def _norm_hash():
    """md5 of whitespace-normalized text — kept identical to
    q_dedup_exact's content hash so exact-duplicate semantics agree
    across both operators.  A function, not a module constant: classic-
    mode Column construction with literal args needs an active
    SparkContext, so a module-level expression would crash any import
    that precedes session creation."""
    return F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))


def _doc_sets(d: DataFrame) -> DataFrame:
    """Per-doc capped shingle sets via the shared dedup helpers (built per
    input frame: the df cap is a per-corpus property, so train and bench
    each get their own)."""
    return doc_shingle_sets(_capped_shingles(d))


def _capped_bands(sets: DataFrame) -> DataFrame:
    """Band rows minus degenerate buckets on this SIDE (shared cap helper
    applied per frame — both sides capped bounds any one bucket's
    cross-side join to cap² pairs)."""
    return drop_overcap_buckets(_minhash_banded(sets))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(train_id, bench_id, jaccard) for every cross-frame pair that is
    either a VERBATIM copy (identical whitespace-normalized text, reported
    as jaccard 1.0 by definition) or shares an LSH band bucket with exact
    shingle Jaccard ≥ ``threshold``.

    Both inputs are (doc_id, text, ...) frames.  Recall: verbatim copies
    are caught unconditionally by the exact hash pre-pass (no cap can
    drop them — see the module docstring's recall-hole note); near-dup
    recall follows the LSH contract (4 bands of 2 over 8 min-hashes —
    detection probability 1-(1-J²)⁴, ≈0.999 at J=0.9, ≈0.84 at J=0.6).
    Precision is exact: LSH pairs are verified with true Jaccard over the
    capped shingle sets, and exact-hash pairs are identical texts.
    Verification joins candidates back to BOTH sets frames row-wise via
    array_intersect — the same no-reshuffle discipline as
    q_dedup_minhash_lsh (dedup.py) — and the bench side of every join
    (bands, sets, hashes) broadcasts under the default asymmetry."""
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
    lsh = (
        cand.join(sa, "train_id")
        .join(wrap(sb), "bench_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("train_id", "bench_id", "jaccard")
    )
    # exact pre-pass: verbatim copies at ANY duplication level — the df /
    # bucket caps cannot drop a hash join, so the most-contaminated texts
    # (a bench doc duplicated in thousands of train docs) are guaranteed
    # caught even though their shingles df-cap away (review finding r6)
    th = train.select(F.col("doc_id").alias("train_id"), _norm_hash().alias("h"))
    bh = bench.select(F.col("doc_id").alias("bench_id"), _norm_hash().alias("h"))
    exact = th.join(wrap(bh), "h").select(
        "train_id", "bench_id", F.lit(1.0).alias("jaccard")
    )
    # a pair can arrive via both paths (identical sets ⇒ LSH jaccard 1.0);
    # max() dedups while preferring the definitional 1.0 whenever the
    # capped-set value diverged (per-corpus df caps can differ per side)
    return (
        lsh.union(exact)
        .groupBy("train_id", "bench_id")
        .agg(F.max("jaccard").alias("jaccard"))
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
