"""Operator inventory exposed to the driver harness.

Each SURVEY.md §2 operator (and each training-pipeline extra) is a named
query: a DataFrame function ``fn(spark, sf_dir)`` paired with an ANSI-SQL
DuckDB oracle. Collected here into the registries __spark_entry__ exports.

Registry size and ORDER are deliberate: CORRECTNESS_r02 recorded exactly
the first 50 of 56 registered queries in registration order — the driver's
gate checks at most 50 entries. Round 3 therefore consolidated same-table /
same-granularity queries (every operator keeps a passing entry; see the
"fused in round 3" notes in each module) so the registry holds exactly the
gate's capacity, and orders the entries risk-first: queries without an r02
driver row lead, long-stable ones trail.
"""

from . import (
    dedup,
    encoded_gate,
    extended,
    multimodal,
    packing,
    relational,
    similarity,
    splits,
    textstats,
)

_MODULES = (
    relational,
    extended,
    dedup,
    similarity,
    textstats,
    multimodal,
    packing,
    encoded_gate,
    splits,
)

_ORDER = [
    # ── new in round 4 (risk-first: no prior driver row) ──
    "encoded_roundtrip_rollup",
    "splits_sample",
    # ── fused in round 4 (j17+j18; langid+quality) ──
    "j17_j18_anti_semi",
    "text_langid_quality",
    # ── r03-green ──
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_transform",
    "pack_sequences",
    "text_vocab_topk",
    "pack_tokens",
    "ocp_aws_pipeline",
    # ── merged / reworked in round 3 ──
    "p2_p3_time_normalize",
    "text_doc_stats",
    "f2_label_pipeline",
    "p6_unit_conversions",
    "p11_null_split",
    "j10_union_dedup_first_wins",
    "s10_wide_to_json",
    "dedup_embedding_cosine",
    "ann_ivf_kmeans",
    # ── stable r02-green ──
    "a1_daily_rollup",
    "p5_effective_usage",
    "p8_case_classify",
    "j1_label_join_dedup",
    "j5_like_theta_join",
    "j8_hourly_inner_join",
    "j11_suffix_theta_join",
    "a3_two_level_capacity",
    "a5_count_distinct",
    "a7_capacity_derivation",
    "a11_minmax_rollup",
    "a15_unallocated",
    "w1_ratio_normalize",
    "u1_union_by_name",
    "star_join_revenue",
    "j12_tag_cascade",
    "a4_nullkey_rollup",
    "p12_null_scrub",
    "p9_savingsplan_normalize",
    "j19_asof_join",
    "j20_range_join",
    "w4_sessionization",
    "a16_grouping_sets",
    "a17_pivot",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "text_rolling_hash",
]

_ALL_Q = {}
_ALL_O = {}
for _m in _MODULES:
    _ALL_Q.update(_m.QUERIES)
    _ALL_O.update(_m.ORACLES)

_missing = set(_ALL_Q) - set(_ORDER)
_unknown = set(_ORDER) - set(_ALL_Q)
assert not _missing and not _unknown, (
    f"registry order out of sync: missing={sorted(_missing)} unknown={sorted(_unknown)}"
)
assert len(_ORDER) <= 50, f"driver gate checks at most 50 entries; have {len(_ORDER)}"

QUERIES = {k: _ALL_Q[k] for k in _ORDER}
ORACLES = {k: _ALL_O[k] for k in _ORDER if k in _ALL_O}

__all__ = ["QUERIES", "ORACLES"]
