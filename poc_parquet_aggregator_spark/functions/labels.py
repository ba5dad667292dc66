"""Label/map/JSON scalar functions (SURVEY.md §2.8 F1-F4).

Spark-first re-expression of the reference's label utilities — all pure
column expressions (JVM-side, codegen'd), no Python UDFs:

  F1 parse_labels            ⇠ utils.py:59-94 (JSON or pipe format)
  F2 merge_label_maps        ⇠ utils.py:113-126 (later overrides earlier;
                               needs spark.sql.mapKeyDedupPolicy=LAST_WIN)
  F3 canonical_label_json    ⇠ utils.py:129-161 (sorted keys, compact)
  F4 filter_labels_by_enabled_keys ⇠ utils.py:97-110 (Trino map_filter)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAP_SS = "map<string,string>"


def parse_labels(col: Column | str) -> Column:
    """JSON object string OR pipe format ("label_app:web|label_tier:db",
    'label_' prefix stripped) → MapType(string,string).

    Reference: utils.py:59-94 — tries json.loads, falls back to pipe parse.
    Here: from_json yields NULL on non-JSON input → coalesce to str_to_map,
    then empty map for NULL/empty input.
    """
    c = F.col(col) if isinstance(col, str) else col
    json_map = F.from_json(c, _MAP_SS)
    # split first, then strip the 'label_' prefix from KEYS ONLY — a blanket
    # regexp_replace on the raw string would mangle values like "app:label_web"
    # (the reference strips the prefix from keys, utils.py:59-94). Caveat: a
    # pathological input holding both 'label_app' and 'app' collides
    # post-strip, exactly as the reference's dict insertion would.
    pipe_map = F.when(
        c.isNotNull() & (c != ""),
        F.transform_keys(
            F.str_to_map(c, F.lit("\\|"), F.lit(":")),
            lambda k, _v: F.regexp_replace(k, "^label_", ""),
        ),
    )
    empty = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    return F.coalesce(json_map, pipe_map, empty)


def merge_label_maps(*maps: Column) -> Column:
    """Later-overrides-earlier map merge (Trino map_concat semantics,
    node→namespace→pod order in aggregator_pod.py:622-647).

    Implemented as a fold of map_concat(map_filter(acc, k ∉ nxt), nxt) so no
    duplicate key ever reaches map_concat — correct under ANY value of
    spark.sql.mapKeyDedupPolicy (the driver harness may run with the default
    EXCEPTION policy)."""
    acc = maps[0]
    for nxt in maps[1:]:
        nxt_keys = F.map_keys(nxt)
        acc = F.map_concat(
            F.map_filter(acc, lambda k, _v: ~F.array_contains(nxt_keys, k)), nxt
        )
    return acc


def filter_labels_by_enabled_keys(m: Column, enabled: list[str]) -> Column:
    """Keep only map entries whose key is enabled (Trino map_filter;
    utils.py:97-110, tag_matcher.py:238-259)."""
    enabled_arr = F.array(*[F.lit(k) for k in enabled])
    return F.map_filter(m, lambda k, _v: F.array_contains(enabled_arr, k))


def canonical_label_json(m: Column) -> Column:
    """Canonical JSON: sorted keys, compact separators (utils.py:129-161 —
    Trino json_format parity). Key order matters because the string is a
    group-by key downstream (SURVEY.md §7.4 #5)."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))
