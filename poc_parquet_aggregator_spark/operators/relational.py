"""SURVEY.md §2 operator inventory over the driver test tables.

Each query re-expresses one reference operator (cited) as idiomatic
DataFrame code; the paired ORACLES entry is the DuckDB-ANSI-SQL equivalent
the driver compares against at sf=0.01. Column aliases match exactly on both
sides (the driver hashes values under sorted column names).

Cross-engine determinism policy (hard-won; see git history):
  * float SUMs use scaled-integer aggregation: floor(x*S + 0.5) is a pure
    binary IEEE op computed identically by Spark and DuckDB, the BIGINT sum
    is exact regardless of partition order, and the final /S division of
    identical integers yields bit-identical doubles on both engines
  * NO fractional round() of doubles anywhere: Spark rounds the shortest
    string repr (BigDecimal(double.toString), HALF_UP) while DuckDB rounds
    the binary value — they disagree whenever the repr ends at the target
    digit with a 5. Integer-target rounding is safe (exact .5 doubles are
    representable and round identically), fractional is not.
  * decimal casts of doubles are equally engine-dependent → avoided
  * per-row double arithmetic (products, divisions) on identical inputs is
    identical IEEE on both engines → raw doubles are emitted un-rounded
  * timestamps surfaced as unix millis (unix_millis ≡ epoch_ms) or strings
  * dedup/rank windows always carry total tiebreak orders
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    canonical_label_json,
    days_in_month,
    effective_usage,
    filter_labels_by_enabled_keys,
    merge_label_maps,
    parse_labels,
)
from ..functions.scalars import to_usage_date


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_S = 1_000_000  # fixed-point scale for float sums (micro-units)


def _fx(c: Column, scale: int = _S) -> Column:
    """Fixed-point long form of a double (deterministic on both engines)."""
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def _isum(c: Column, scale: int = _S) -> Column:
    """Deterministic cross-engine SUM of doubles: fixed-point long sum.
    Headroom: 6e5 rows × 1e5 magnitude × 1e6 scale ≈ 6e16 ≪ 2^63."""
    return F.sum(_fx(c, scale)) / F.lit(float(scale))


def _duck_isum(expr: str, scale: int = _S) -> str:
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {scale}.0 + 0.5) AS BIGINT)) AS BIGINT)"
        f" / {scale}.0)"
    )


# ───────────────────────────────── A1/A2: main daily rollup (flagship) ──────
# Reference: aggregator_pod.py:649-739 (Trino 260-316) — groupBy + SUM with
# unit conversion + MAX; partial/final agg (A2, aggregator_pod.py:384-419) is
# Catalyst's HashAggregate for free. TPC-H-Q1-shaped over lineitem.


def q_a1_daily_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    # money to integer cents, discount to integer percent: the weighted sum
    # becomes exact integer arithmetic (identical on any engine/order)
    cents = _fx(F.col("l_extendedprice"), 100)
    pct = _fx(F.col("l_discount"), 100)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _isum(F.col("l_quantity")).alias("sum_qty"),
            (_isum(F.col("l_quantity")) / 3600.0).alias("sum_core_hours"),
            _isum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(cents * (100 - pct)) / 10000.0).alias("sum_disc_price"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_orderkey").alias("first_orderkey"),
            F.count("*").alias("count_order"),
        )
    )


_CENTS = "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
_PCT = "CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)"

ORACLE_A1 = f"""
SELECT l_returnflag, l_linestatus,
       {_duck_isum('l_quantity')}                              AS sum_qty,
       {_duck_isum('l_quantity')} / 3600.0                     AS sum_core_hours,
       {_duck_isum('l_extendedprice')}                         AS sum_base_price,
       CAST(sum({_CENTS} * (100 - {_PCT})) AS BIGINT) / 10000.0 AS sum_disc_price,
       max(l_quantity)                                         AS max_qty,
       min(l_orderkey)                                         AS first_orderkey,
       count(*)                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# P1 (non-empty string filter, aggregator_pod.py:432-442 / Trino 309) is
# covered inside q_p11_null_split's third branch since round 3 (driver gate
# checks ≤50 registry entries).


# ─────────── P2+P3: timestamp normalize (nise string form) + hour floor ─────
# Reference: aggregator_pod.py:444-457 — the engine round-trips the string
# form "YYYY-MM-DD HH:MM:SS +0000 UTC" through strip→parse→date (P2); and
# cost_attributor.py:143-162 — .dt.floor("H") → date_trunc('hour') (P3).
# One query covers both (round 3: the driver gate checks ≤50 entries, so
# same-table time-normalization operators fused; the hour rollup subsumes
# the date rollup's granularity).


def q_p2_p3_time_normalize(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    nise = F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit(" +0000 UTC"))
    return (
        ev.withColumn("usage_start", to_usage_date(nise))
        .withColumn(
            "usage_hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")
        )
        .groupBy("usage_start", "usage_hour")
        .agg(
            F.count("*").alias("n_events"),
            _isum(F.col("value")).alias("sum_value"),
        )
        .withColumn("usage_start", F.col("usage_start").cast("string"))
    )


ORACLE_P2_P3 = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS usage_start,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS usage_hour,
       count(*) AS n_events, {_duck_isum('value')} AS sum_value
FROM events GROUP BY 1, 2
"""


# ──────────────── P5: effective usage = coalesce(eff, greatest(u, r)) ───────
# Reference: aggregator_pod.py:685-708, utils.py:188-237 (Trino 277/281)


def q_p5_effective_usage(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    eff = effective_usage(
        F.nullif(F.col("l_tax"), F.lit(0.0)) * 100.0,
        F.col("l_quantity"),
        F.col("l_discount") * 100.0,
    )
    return (
        li.withColumn("effective", eff)
        .groupBy("l_returnflag")
        .agg(
            _isum(F.col("effective")).alias("sum_effective"),
            F.count("*").alias("n"),
        )
    )


ORACLE_P5 = f"""
SELECT l_returnflag,
       {_duck_isum("coalesce(nullif(l_tax, 0.0) * 100.0, greatest(l_quantity, l_discount * 100.0))")}
         AS sum_effective,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# ── P6+F8+F12/F13: unit conversions + lpad month key + money formatting ─────
# Reference: aggregator_storage.py:348-423, utils.py:164-185,
# disk_capacity_calculator.py:57-79 (Trino last_day_of_month);
# db_writer.py:435-436 (Trino 665 lpad), utils.py:280-292 (decimal(33,9)
# money strings — formatted from exact integer cents → identical strings on
# both engines). Fused in round 3 (driver gate checks ≤50): same scan, same
# monthly grain.


def q_p6_unit_conversions(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    cents = _fx(F.col("o_totalprice"), 100)
    return (
        o.withColumn("year", F.year("o_orderdate").cast("string"))
        .withColumn("month", F.lpad(F.month("o_orderdate").cast("string"), 2, "0"))
        .withColumn("days_in_month", days_in_month(F.col("o_orderdate")))
        .groupBy("year", "month", "days_in_month")
        .agg(
            (_isum(F.col("o_totalprice")) / 3600.0).alias("price_per_hour_sum"),
            (
                _isum(F.col("o_totalprice"))
                * 1048576.0
                / (86400.0 * F.first("days_in_month") * F.pow(F.lit(2.0), F.lit(30.0)))
            ).alias("gb_months"),
            F.sum(cents).alias("sum_cents"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "total_decimal",
            F.format_string(
                "%d.%02d0000000",
                (F.col("sum_cents") / 100).cast("long"),
                (F.col("sum_cents") % 100).cast("long"),
            ),
        )
        .drop("sum_cents")
    )


ORACLE_P6 = f"""
WITH agg AS (
  SELECT CAST(date_part('year', o_orderdate) AS VARCHAR) AS year,
         lpad(CAST(date_part('month', o_orderdate) AS VARCHAR), 2, '0') AS month,
         date_part('day', last_day(o_orderdate)) AS days_in_month,
         {_duck_isum('o_totalprice')} / 3600.0 AS price_per_hour_sum,
         {_duck_isum('o_totalprice')} * 1048576.0 /
               (86400.0 * date_part('day', last_day(o_orderdate)) * power(2.0, 30.0))
           AS gb_months,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
         count(*) AS n
  FROM orders GROUP BY 1, 2, 3)
SELECT year, month, days_in_month, price_per_hour_sum, gb_months, n,
       printf('%d.%02d0000000', sum_cents // 100, sum_cents % 100) AS total_decimal
FROM agg
"""


# ───────────────── P8: chained CASE predicate classification ────────────────
# Reference: aws_data_loader.py:57-139 (network direction detection)


def q_p8_case_classify(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    cls = (
        F.when(F.col("o_orderpriority").startswith("1-"), "urgent")
        .when(F.col("o_orderpriority").startswith("2-"), "high")
        .when(F.col("o_orderpriority").contains("MEDIUM"), "medium")
        .otherwise("other")
    )
    return (
        o.withColumn("priority_class", cls)
        .groupBy("priority_class")
        .agg(
            F.count("*").alias("n"),
            _isum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


ORACLE_P8 = f"""
SELECT CASE WHEN o_orderpriority LIKE '1-%' THEN 'urgent'
            WHEN o_orderpriority LIKE '2-%' THEN 'high'
            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'medium'
            ELSE 'other' END AS priority_class,
       count(*) AS n, {_duck_isum('o_totalprice')} AS sum_price
FROM orders GROUP BY 1
"""


# ──────── F1+F2+F3+F4/P13: label parse → merge → filter → canonical JSON ────
# Reference: utils.py:59-161, tag_matcher.py:238-259; LAST_WIN precedence.
# Covers BOTH parse formats (round 3 fused the former f1_pipe_labels entry —
# driver gate checks ≤50): the JSON form comes from props, the pipe form
# ("label_type:click|label_user:7", 'label_' prefix stripped from keys) is
# synthesized from the event columns and flows through the same merge →
# filter → canonical-JSON chain; type_label surfaces the pipe-parsed value.


def q_f2_label_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    base = parse_labels(F.col("props"))
    pipe = F.concat(
        F.lit("label_type:"), F.col("event_type"), F.lit("|label_user:"),
        F.col("user_id").cast("string"),
    )
    pipe_map = parse_labels(pipe)  # F1 pipe-format fallback path
    extra = F.create_map(
        F.lit("event_type"), F.col("event_type"), F.lit("k"), F.lit("overridden")
    )
    merged = merge_label_maps(base, pipe_map, extra)  # later wins: k → 'overridden'
    enabled = filter_labels_by_enabled_keys(merged, ["k", "event_type", "type", "user"])
    return (
        ev.withColumn("label_json", canonical_label_json(enabled))
        .withColumn("type_label", pipe_map.getItem("type"))
        .filter(pipe_map.getItem("user") == F.col("user_id").cast("string"))
        .groupBy("label_json", "type_label")
        .agg(F.count("*").alias("n"))
    )


ORACLE_F2 = """
SELECT to_json(struct_pack(event_type := event_type, k := 'overridden',
                           "type" := event_type,
                           "user" := CAST(user_id AS VARCHAR))) AS label_json,
       event_type AS type_label, count(*) AS n
FROM events GROUP BY 1, 2
"""


# ───────────── J1/J2 + W2: label join with keep-last dedup ───────────────────
# Reference: aggregator_pod.py:516-620 (merge) + :559 (drop_duplicates
# keep='last' — "CRITICAL … Cartesian product"). Labels = latest event_type
# per (day, user); broadcast left join onto the daily rollup.


def q_j1_label_join_dedup(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn("usage_date", F.to_date("ts"))
    w = Window.partitionBy("usage_date", "user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    labels = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("usage_date", "user_id", F.col("event_type").alias("day_label"))
    )
    daily = ev.groupBy("usage_date", "user_id").agg(
        F.count("*").alias("n_events"),
        _isum(F.col("value")).alias("sum_value"),
    )
    return daily.join(F.broadcast(labels), ["usage_date", "user_id"], "left").withColumn(
        "usage_date", F.col("usage_date").cast("string")
    )


ORACLE_J1 = f"""
WITH labels AS (
  SELECT * FROM (
    SELECT CAST(ts AS DATE) AS usage_date, user_id, event_type AS day_label,
           row_number() OVER (PARTITION BY CAST(ts AS DATE), user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), daily AS (
  SELECT CAST(ts AS DATE) AS usage_date, user_id,
         count(*) AS n_events, {_duck_isum('value')} AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT CAST(d.usage_date AS VARCHAR) AS usage_date, d.user_id, d.n_events, d.sum_value, l.day_label
FROM daily d LEFT JOIN labels l USING (usage_date, user_id)
"""


# ─────────────── J5: LIKE-pattern theta join + MAX(category) ────────────────
# Reference: aggregator_pod.py:778-808 (Trino 264: namespace LIKE pattern →
# MAX(cost_category_id)); broadcast non-equi join.


_CATEGORIES = [
    ("ECO%", 1),
    ("%SMALL%", 2),
    ("MED%", 3),
    ("%O%", 4),  # overlapping pattern → MAX decides
]


def q_j5_like_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    cats = spark.createDataFrame(_CATEGORIES, ["pattern", "category_id"])
    matched = part.join(F.broadcast(cats), F.expr("p_type LIKE pattern"), "left")
    return (
        matched.groupBy("p_partkey")
        .agg(F.max("category_id").alias("category_id"))
        .groupBy("category_id")
        .agg(F.count("*").alias("n_parts"))
    )


ORACLE_J5 = """
WITH cats(pattern, category_id) AS (VALUES ('ECO%', 1), ('%SMALL%', 2), ('MED%', 3), ('%O%', 4)),
matched AS (
  SELECT p.p_partkey, max(c.category_id) AS category_id
  FROM part p LEFT JOIN cats c ON p.p_type LIKE c.pattern
  GROUP BY p.p_partkey)
SELECT category_id, count(*) AS n_parts FROM matched GROUP BY category_id
"""


# ──────────── J8/J9: hourly-key inner join (resource-id matching) ───────────
# Reference: cost_attributor.py:125-304 — OCP rows ⋈ small AWS side on
# (key, hour); small side broadcast.


def q_j8_hourly_inner_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    hours = ev.withColumn("usage_hour", F.date_trunc("hour", "ts"))
    costs = hours.groupBy("user_id", "usage_hour").agg(
        _isum(F.col("value")).alias("hour_cost")
    )
    joined = hours.join(F.broadcast(costs), ["user_id", "usage_hour"], "inner")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _isum(F.col("hour_cost")).alias("sum_hour_cost"),
    )


ORACLE_J8 = f"""
WITH hours AS (SELECT *, date_trunc('hour', ts) AS usage_hour FROM events),
costs AS (SELECT user_id, usage_hour, {_duck_isum('value')} AS hour_cost
          FROM hours GROUP BY 1, 2)
SELECT h.event_type, count(*) AS n,
       {_duck_isum('c.hour_cost')} AS sum_hour_cost
FROM hours h JOIN costs c USING (user_id, usage_hour)
GROUP BY h.event_type
"""


# ───────────── J11: suffix-match theta join with priority cascade ───────────
# Reference: resource_matcher.py:107-248 — aws_id.endswith(ocp_id), priority
# node→PV→CSI, first match wins → broadcast LIKE-suffix join + row_number.


_SUFFIXES = [("2", 1), ("5", 2), ("7", 3)]  # (digit suffix, priority)


def q_j11_suffix_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    dim = spark.createDataFrame(_SUFFIXES, ["suffix", "priority"])
    joined = part.join(
        F.broadcast(dim), F.col("p_brand").endswith(F.col("suffix")), "inner"
    )
    w = Window.partitionBy("p_partkey").orderBy("priority")
    best = joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.groupBy("suffix").agg(
        F.count("*").alias("n_parts"), F.min("p_partkey").alias("min_partkey")
    )


ORACLE_J11 = """
WITH dim(suffix, priority) AS (VALUES ('2', 1), ('5', 2), ('7', 3)),
matched AS (
  SELECT p.p_partkey, d.suffix, d.priority,
         row_number() OVER (PARTITION BY p.p_partkey ORDER BY d.priority) AS rn
  FROM part p JOIN dim d ON p.p_brand LIKE '%' || d.suffix)
SELECT suffix, count(*) AS n_parts, min(p_partkey) AS min_partkey
FROM matched WHERE rn = 1 GROUP BY suffix
"""


# ───────── J17 + J18: anti join + semi join (set-diff / set-match) ──────────
# Reference: cost_attributor.py:1150-1159 — ~isin(attributed ids) →
# left_anti; aggregator_ocp_aws.py:692-706 — isin(csi_handles) → left_semi.
# Fused into ONE registry entry in round 4 (gate caps at 50): each branch is
# the same isolated operator as before, union'd under a section tag.


def q_j17_j18_anti_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    no_f_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    anti = no_f_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        _isum(F.col("c_acctbal")).alias("sum_acctbal"),
    ).select(
        F.lit("anti").alias("op"), F.col("c_mktsegment").alias("key"),
        "n", "sum_acctbal",
    )
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    active = s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
    semi = active.groupBy("s_nationkey").agg(F.count("*").alias("n")).select(
        F.lit("semi").alias("op"),
        F.col("s_nationkey").cast("string").alias("key"),
        "n",
        F.lit(None).cast("double").alias("sum_acctbal"),
    )
    return anti.unionByName(semi)


ORACLE_J17_J18 = f"""
SELECT 'anti' AS op, c_mktsegment AS key, count(*) AS n,
       {_duck_isum('c_acctbal')} AS sum_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY c_mktsegment
UNION ALL
SELECT 'semi', CAST(s_nationkey AS VARCHAR), count(*), NULL
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
GROUP BY s_nationkey
"""


# ──────── A3 + J4/W3: two-level capacity rollup + cluster fan-out ───────────
# Reference: aggregator_pod.py:904-1073 — MAX per (hour, node) → SUM per
# (day, node) → day total fanned back via window SUM (the J4 join expressed
# idiomatically as a window).


def q_a3_two_level_capacity(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    l1 = (
        ev.withColumn("usage_hour", F.date_trunc("hour", "ts"))
        .withColumn("usage_date", F.to_date("ts"))
        .groupBy("usage_date", "usage_hour", "user_id")
        .agg(F.max("value").alias("hour_cap"))
    )
    l2 = l1.groupBy("usage_date", "user_id").agg(
        _isum(F.col("hour_cap")).alias("user_cap")
    )
    # whole-partition window on the PRE-AGGREGATED per-(date,user) frame:
    # one buffered (spill-backed) partition per day of distinct users, not
    # per raw row; a corpus with billions of users/day would switch to the
    # groupBy+join form of the same fan-out
    day_total = (
        F.sum(_fx(F.col("user_cap"))).over(Window.partitionBy("usage_date"))
        / F.lit(float(_S))
    )
    return l2.withColumn("day_total", day_total).withColumn(
        "usage_date", F.col("usage_date").cast("string")
    )


ORACLE_A3 = f"""
WITH l1 AS (
  SELECT CAST(ts AS DATE) AS usage_date, date_trunc('hour', ts) AS usage_hour,
         user_id, max(value) AS hour_cap
  FROM events GROUP BY 1, 2, 3),
l2 AS (
  SELECT usage_date, user_id, {_duck_isum('hour_cap')} AS user_cap
  FROM l1 GROUP BY 1, 2)
SELECT CAST(usage_date AS VARCHAR) AS usage_date, user_id, user_cap,
       CAST(sum(CAST(floor(user_cap * {_S}.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY usage_date) AS BIGINT) / {_S}.0 AS day_total
FROM l2
"""


# ─────────────── A5 + J7: countDistinct + shared-resource division ──────────
# Reference: aggregator_storage.py:284-309 — nunique(node) per PV, metrics
# divided by node_count.


def q_a5_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("usage_date", F.to_date("ts"))
        .groupBy("usage_date", "event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            _isum(F.col("value")).alias("sum_value"),
        )
        .withColumn("value_per_user", F.col("sum_value") / F.col("n_users"))
        .withColumn("usage_date", F.col("usage_date").cast("string"))
    )


ORACLE_A5 = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS usage_date, event_type,
       count(DISTINCT user_id) AS n_users,
       {_duck_isum('value')} AS sum_value,
       {_duck_isum('value')} / count(DISTINCT user_id) AS value_per_user
FROM events GROUP BY 1, 2
"""


# ───────────── A7: capacity derivation from cost/rate (round to int) ────────
# Reference: disk_capacity_calculator.py:123-303 — MAX(cost), MAX(rate),
# capacity = round(cost / (rate / hours_in_month)), keep > 0.
# Integer-target round IS cross-engine-safe (exact .5 doubles round alike).


def q_a7_capacity_derivation(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.max("l_extendedprice").alias("max_cost"), F.max("l_discount").alias("max_rate")
    )
    cap = F.round(F.col("max_cost") / (F.col("max_rate") * 730.0 + 1.0)).cast("long")
    return (
        agg.withColumn("capacity", cap)
        .filter(F.col("capacity") > 0)
        .select("l_partkey", "capacity")
    )


ORACLE_A7 = """
SELECT l_partkey,
       CAST(round(max(l_extendedprice) / (max(l_discount) * 730.0 + 1.0)) AS BIGINT) AS capacity
FROM lineitem GROUP BY l_partkey
HAVING CAST(round(max(l_extendedprice) / (max(l_discount) * 730.0 + 1.0)) AS BIGINT) > 0
"""


# ──────────── A11: rollup with MIN(start)/MAX(end) timestamps ───────────────
# Reference: network_cost_handler.py:171-193 (Trino 844-904)


def q_a11_minmax_rollup(spark: SparkSession, sf: str) -> DataFrame:
    # NTZ→TZ cast below reads the session timezone; pin it so unix_millis
    # matches DuckDB's epoch_ms under any harness session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        _isum(F.col("value")).alias("sum_value"),
        F.unix_millis(F.min("ts").cast("timestamp")).alias("start_ms"),
        F.unix_millis(F.max("ts").cast("timestamp")).alias("end_ms"),
        F.count("*").alias("n"),
    )


ORACLE_A11 = f"""
SELECT event_type, {_duck_isum('value')} AS sum_value,
       epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms, count(*) AS n
FROM events GROUP BY event_type
"""


# ─────────── A12/A15 + P7: unallocated = capacity − usage, with CASE ────────
# Reference: aggregator_unallocated.py:176-292 (Trino 507-526)


def q_a15_unallocated(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    per_user = (
        ev.withColumn("usage_date", F.to_date("ts"))
        .filter(~F.col("event_type").isin("error"))  # P7 synthetic-ns exclusion
        .groupBy("usage_date", "user_id")
        .agg(
            F.max("value").alias("capacity_proxy"),
            _isum(F.col("value")).alias("usage"),
        )
        .withColumn(
            "unallocated",
            F.greatest(F.col("capacity_proxy") * 24.0 - F.col("usage"), F.lit(0.0)),
        )
    )
    return (
        per_user.groupBy("usage_date")
        .agg(
            _isum(F.col("unallocated")).alias("sum_unallocated"),
            F.count("*").alias("n_users"),
        )
        .withColumn("usage_date", F.col("usage_date").cast("string"))
    )


ORACLE_A15 = f"""
WITH per_user AS (
  SELECT CAST(ts AS DATE) AS usage_date, user_id,
         greatest(max(value) * 24.0 - {_duck_isum('value')}, 0.0) AS unallocated
  FROM events WHERE event_type NOT IN ('error')
  GROUP BY 1, 2)
SELECT CAST(usage_date AS VARCHAR) AS usage_date,
       {_duck_isum('unallocated')} AS sum_unallocated, count(*) AS n_users
FROM per_user GROUP BY usage_date
"""


# ───────────────── W1: ratio normalization window ───────────────────────────
# Reference: cost_attributor.py:519-573 — transform('sum') per (resource,
# hour); shares sum to 1 within the partition.


def q_w1_ratio_normalize(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", "ts"))
    denom = F.sum(_fx(F.col("value"))).over(w) / F.lit(float(_S))
    # nullif: an all-zero partition yields NULL share (ANSI div-by-zero safe)
    return ev.select(
        "event_id", (F.col("value") / F.nullif(denom, F.lit(0.0))).alias("cost_share")
    )


ORACLE_W1 = f"""
SELECT event_id,
       value / nullif(CAST(sum(CAST(floor(value * {_S}.0 + 0.5) AS BIGINT))
                     OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS BIGINT) / {_S}.0, 0.0)
         AS cost_share
FROM events
"""


# ──────────── U1: unionByName with missing columns ──────────────────────────
# Reference: main.py:433,470 — pd.concat of pod+storage summaries →
# unionByName(allowMissingColumns=True)


def q_u1_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn("usage_date", F.to_date("ts"))
    pod = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("usage_date")
        .agg(
            _isum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("summary_type", F.lit("pod"))
    )
    storage = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("usage_date")
        .agg(_isum(F.col("value")).alias("sum_value"))
        .withColumn("summary_type", F.lit("storage"))
    )
    return pod.unionByName(storage, allowMissingColumns=True).withColumn(
        "usage_date", F.col("usage_date").cast("string")
    )


ORACLE_U1 = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS usage_date,
       {_duck_isum('value')} AS sum_value,
       count(DISTINCT user_id) AS n_users, 'pod' AS summary_type
FROM events WHERE event_type = 'click' GROUP BY 1
UNION ALL
SELECT CAST(CAST(ts AS DATE) AS VARCHAR), {_duck_isum('value')}, NULL, 'storage'
FROM events WHERE event_type = 'view' GROUP BY 1
"""


# F7 (LIKE-family predicate counts, resource_matcher.py:173,192,214 /
# aggregator_pod.py:796-799) is covered inside q_s10_wide_to_json's per-group
# predicate sums since round 3; F12/F13 (lpad month + money formatting,
# db_writer.py:435-436, utils.py:280-292) moved into q_p6_unit_conversions.


# ─────────────── flagship multi-join (J3-shaped star join) ──────────────────
# Reference shape: aggregator_ocp_aws multi-way joins; TPC-H-Q3-like:
# customer ⋈ orders ⋈ lineitem with broadcast dimensions.


def q_star_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n = _t(spark, sf, "nation")
    cents = _fx(F.col("l_extendedprice"), 100)
    pct = _fx(F.col("l_discount"), 100)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            (F.sum(cents * (100 - pct)) / 10000.0).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


ORACLE_STAR = f"""
SELECT n.n_name, c.c_mktsegment,
       CAST(sum({_CENTS} * (100 - {_PCT})) AS BIGINT) / 10000.0 AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, c.c_mktsegment
"""


QUERIES = {
    "a1_daily_rollup": q_a1_daily_rollup,
    "p2_p3_time_normalize": q_p2_p3_time_normalize,
    "p5_effective_usage": q_p5_effective_usage,
    "p6_unit_conversions": q_p6_unit_conversions,
    "p8_case_classify": q_p8_case_classify,
    "f2_label_pipeline": q_f2_label_pipeline,
    "j1_label_join_dedup": q_j1_label_join_dedup,
    "j5_like_theta_join": q_j5_like_theta_join,
    "j8_hourly_inner_join": q_j8_hourly_inner_join,
    "j11_suffix_theta_join": q_j11_suffix_theta_join,
    "j17_j18_anti_semi": q_j17_j18_anti_semi,
    "a3_two_level_capacity": q_a3_two_level_capacity,
    "a5_count_distinct": q_a5_count_distinct,
    "a7_capacity_derivation": q_a7_capacity_derivation,
    "a11_minmax_rollup": q_a11_minmax_rollup,
    "a15_unallocated": q_a15_unallocated,
    "w1_ratio_normalize": q_w1_ratio_normalize,
    "u1_union_by_name": q_u1_union_by_name,
    "star_join_revenue": q_star_join_revenue,
}

ORACLES = {
    "a1_daily_rollup": ORACLE_A1,
    "p2_p3_time_normalize": ORACLE_P2_P3,
    "p5_effective_usage": ORACLE_P5,
    "p6_unit_conversions": ORACLE_P6,
    "p8_case_classify": ORACLE_P8,
    "f2_label_pipeline": ORACLE_F2,
    "j1_label_join_dedup": ORACLE_J1,
    "j5_like_theta_join": ORACLE_J5,
    "j8_hourly_inner_join": ORACLE_J8,
    "j11_suffix_theta_join": ORACLE_J11,
    "j17_j18_anti_semi": ORACLE_J17_J18,
    "a3_two_level_capacity": ORACLE_A3,
    "a5_count_distinct": ORACLE_A5,
    "a7_capacity_derivation": ORACLE_A7,
    "a11_minmax_rollup": ORACLE_A11,
    "a15_unallocated": ORACLE_A15,
    "w1_ratio_normalize": ORACLE_W1,
    "u1_union_by_name": ORACLE_U1,
    "star_join_revenue": ORACLE_STAR,
}


# ──── J10 + A13: dedup policies — union first-wins + per-key MAX dedup ──────
# Reference: cost_attributor.py:306-321 — resource-id matches take priority
# over tag matches; union, then row_number keep-first by priority (J10); and
# aggregator_unallocated.py:72-91 (Trino 491-498) — per-key MAX dedup (A13).
# Both dedup policies share one query/output shape since round 3 (driver
# gate checks ≤50): (policy, key, n).


def q_j10_union_dedup_first_wins(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    path_a = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select("event_id", "user_id")
        .withColumn("match_kind", F.lit("resource"))
        .withColumn("priority", F.lit(1))
    )
    path_b = (
        ev.filter(F.col("value") > 10.0)
        .select("event_id", "user_id")
        .withColumn("match_kind", F.lit("tag"))
        .withColumn("priority", F.lit(2))
    )
    both = path_a.unionByName(path_b)
    w = Window.partitionBy("event_id").orderBy("priority")
    best = both.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    first_wins = best.groupBy("match_kind").agg(F.count("*").alias("n")).select(
        F.lit("first_wins").alias("policy"), F.col("match_kind").alias("key"), "n"
    )
    roles = ev.groupBy("user_id").agg(F.max("event_type").alias("role"))
    max_dedup = roles.groupBy("role").agg(F.count("*").alias("n")).select(
        F.lit("max_dedup").alias("policy"), F.col("role").alias("key"), "n"
    )
    return first_wins.unionByName(max_dedup)


ORACLE_J10 = """
WITH unioned AS (
  SELECT event_id, user_id, 'resource' AS match_kind, 1 AS priority
  FROM events WHERE event_type IN ('click', 'view')
  UNION ALL
  SELECT event_id, user_id, 'tag', 2 FROM events WHERE value > 10.0),
best AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY priority) AS rn
  FROM unioned),
roles AS (SELECT user_id, max(event_type) AS role FROM events GROUP BY user_id)
SELECT 'first_wins' AS policy, match_kind AS key, count(*) AS n
FROM best WHERE rn = 1 GROUP BY match_kind
UNION ALL
SELECT 'max_dedup', role, count(*) FROM roles GROUP BY role
"""


# ──── P1 + P10/P11: non-empty filter + contains-predicate + null split ───────
# Reference: aggregator_ocp_aws.py:687-709 (EBS contains), network_cost_
# handler.py:51-93 (split rows by data_transfer_direction null-ness), and
# aggregator_pod.py:432-442 (P1: node IS NOT NULL AND != '' — the third
# branch below, fused in round 3: same scan, same output shape).


def q_p11_null_split(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    tagged = o.withColumn(
        "direction",
        F.when(F.col("o_orderpriority").contains("HIGH"), "IN")
        .when(F.col("o_orderpriority").contains("LOW"), "OUT")
        .otherwise(F.lit(None).cast("string")),
    )
    network = tagged.filter(F.col("direction").isNotNull())
    compute = tagged.filter(F.col("direction").isNull())
    a = network.groupBy("direction").agg(
        F.count("*").alias("n"), _isum(F.col("o_totalprice")).alias("sum_price")
    )
    b = compute.agg(
        F.count("*").alias("n"), _isum(F.col("o_totalprice")).alias("sum_price")
    ).withColumn("direction", F.lit("none"))
    # P1 branch: non-empty-string filter + status predicate, keyed per value
    p1 = (
        o.filter(F.col("o_orderpriority").isNotNull() & (F.col("o_orderpriority") != ""))
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(F.concat(F.lit("open:"), F.col("o_orderpriority")).alias("direction"))
        .agg(F.count("*").alias("n"), _isum(F.col("o_totalprice")).alias("sum_price"))
    )
    return a.unionByName(b.select("direction", "n", "sum_price")).unionByName(p1)


ORACLE_P11 = f"""
WITH tagged AS (
  SELECT *, CASE WHEN o_orderpriority LIKE '%HIGH%' THEN 'IN'
                 WHEN o_orderpriority LIKE '%LOW%' THEN 'OUT' END AS direction
  FROM orders)
SELECT direction, count(*) AS n, {_duck_isum('o_totalprice')} AS sum_price
FROM tagged WHERE direction IS NOT NULL GROUP BY direction
UNION ALL
SELECT 'none', count(*), {_duck_isum('o_totalprice')}
FROM tagged WHERE direction IS NULL
UNION ALL
SELECT 'open:' || o_orderpriority, count(*), {_duck_isum('o_totalprice')}
FROM orders
WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> '' AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


# F1 (pipe-format label parsing, utils.py:59-94) is exercised inside
# q_f2_label_pipeline since round 3 — the pipe string flows through the same
# parse → merge → filter → canonical-JSON chain and surfaces as type_label.


# ───── S10+F7: wide columns → JSON column, + LIKE-family predicate sums ──────
# Reference: aws_data_loader.py:207-288 — resourceTags/user:* consolidated
# into one JSON column, originals dropped; F7's startswith/contains/endswith
# predicate counts (resource_matcher.py:173,192,214) ride the same groupBy
# (fused in round 3: driver gate checks ≤50 registry entries).


def q_s10_wide_to_json(spark: SparkSession, sf: str) -> DataFrame:
    p = _t(spark, sf, "part")
    tags = F.to_json(F.struct(F.col("p_brand").alias("brand"), F.col("p_type").alias("type")))
    return (
        p.withColumn("resourcetags", tags)
        .groupBy("resourcetags")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
            F.sum(F.when(F.col("p_type").startswith("ECO"), 1).otherwise(0)).alias("n_eco"),
            F.sum(F.when(F.col("p_name").contains("widget"), 1).otherwise(0)).alias("n_widget"),
            F.sum(F.when(F.col("p_brand").endswith("3"), 1).otherwise(0)).alias("n_brand3"),
        )
    )


ORACLE_S10 = """
SELECT to_json(struct_pack(brand := p_brand, type := p_type)) AS resourcetags,
       count(*) AS n_parts, min(p_partkey) AS min_partkey,
       CAST(sum(CASE WHEN p_type LIKE 'ECO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_eco,
       CAST(sum(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END) AS BIGINT) AS n_widget,
       CAST(sum(CASE WHEN p_brand LIKE '%3' THEN 1 ELSE 0 END) AS BIGINT) AS n_brand3
FROM part GROUP BY 1
"""


QUERIES.update(
    {
        "j10_union_dedup_first_wins": q_j10_union_dedup_first_wins,
        "p11_null_split": q_p11_null_split,
        "s10_wide_to_json": q_s10_wide_to_json,
    }
)
ORACLES.update(
    {
        "j10_union_dedup_first_wins": ORACLE_J10,
        "p11_null_split": ORACLE_P11,
        "s10_wide_to_json": ORACLE_S10,
    }
)


# ═══════════ J12: full tag-matcher priority cascade (one query) ══════════════
# Reference: tag_matcher.py:261-499 — parse resourcetags, filter to enabled
# keys, then a six-stage priority cascade for rows NOT already matched by
# resource id (J11/J13): openshift_cluster vs cluster ids (1) / cluster
# aliases (2), openshift_node vs node names (3), openshift_project vs
# namespaces (4), then generic k=v membership in the pod-label set (5) and
# volume-label set (6); first match wins, in tag insertion order within the
# generic stages (here: lexicographic key order, which coincides).
#
# Distributed form: explode the tags map once, semi-filter by the enabled-key
# dim (broadcast — reference reads it from PostgreSQL, db_writer.py:80-165),
# then six equality joins against the DISTINCT label-set relations and one
# first-wins window. At 100 TB the label sets are themselves large tables →
# these are shuffle hash joins on value; nothing here is per-row Python and
# no stage rescans the cascade (the parsed-tags frame is cached once).

_J12_SPECIAL = ("openshift_cluster", "openshift_node", "openshift_project")
_J12_ENABLED = [*_J12_SPECIAL, "app", "env"]  # cost-center is NOT enabled


def _j12_tag_map() -> Column:
    """Deterministic synthetic resourcetags map; conditional keys via
    map_filter, mirroring sparse AWS tags (the cost-center tag exists on
    every row but is filtered out by the enabled-keys dim)."""
    pk, psz = F.col("p_partkey"), F.col("p_size")
    return F.map_filter(
        F.create_map(
            F.lit("openshift_cluster"),
            F.when(pk % 7 == 0, F.concat(F.lit("cluster-"), (pk % 50).cast("string"))),
            F.lit("openshift_node"),
            F.when(pk % 5 == 0, F.concat(F.lit("node-"), (pk % 100).cast("string"))),
            F.lit("openshift_project"),
            F.when(pk % 3 == 0, F.concat(F.lit("ns-"), (pk % 40).cast("string"))),
            F.lit("app"),
            F.concat(F.col("p_brand"), F.lit("-"), (pk % 16).cast("string")),
            F.lit("env"),
            F.concat(F.lit("env"), (psz % 4).cast("string")),
            F.lit("cost-center"),
            F.concat(F.lit("cc-"), (pk % 10).cast("string")),
        ),
        lambda _k, v: v.isNotNull(),
    )


def _j12_match_dim(spark: SparkSession, sf: str) -> DataFrame:
    """ONE unioned match dimension (join_key, stage, match_type, tag_suffix)
    covering all six cascade stages — round 3 fused the former six staged
    joins into a single equi join on join_key (= 'key=value'): the special
    stages' keys are fixed strings, so prefixing the value with them makes
    every stage the same join shape; the generic label sets already are
    'k=v'. matched_tag reconstructs as join_key || tag_suffix. Cross-stage
    duplicates are fine — the first-wins window resolves them. At 100 TB
    this is one shuffle-hash join on join_key instead of six scans of a
    cached tags frame (no cache needed at all anymore)."""
    pk = F.col("p_partkey")
    clusters = (
        _t(spark, sf, "supplier")
        .select(F.concat(F.lit("openshift_cluster=cluster-"), (F.col("s_suppkey") % 30).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(1).alias("stage"), F.lit("cluster_id").alias("match_type"), F.lit("").alias("tag_suffix"))
    )
    aliases = (
        _t(spark, sf, "nation")
        .select(F.concat(F.lit("openshift_cluster=cluster-"), (F.col("n_nationkey") % 10 + 30).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(2).alias("stage"), F.lit("cluster_alias").alias("match_type"), F.lit(" (alias)").alias("tag_suffix"))
    )
    nodes = (
        _t(spark, sf, "customer")
        .select(F.concat(F.lit("openshift_node=node-"), (F.col("c_custkey") % 60).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(3).alias("stage"), F.lit("node").alias("match_type"), F.lit("").alias("tag_suffix"))
    )
    namespaces = (
        _t(spark, sf, "orders")
        .select(F.concat(F.lit("openshift_project=ns-"), (F.col("o_orderkey") % 26).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(4).alias("stage"), F.lit("project").alias("match_type"), F.lit("").alias("tag_suffix"))
    )
    pod_labels = (
        _t(spark, sf, "part")
        .filter(pk % 4 == 0)
        .select(F.concat(F.lit("app="), F.col("p_brand"), F.lit("-"), (pk % 16).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(5).alias("stage"), F.lit("pod_labels").alias("match_type"), F.lit(" (pod_labels)").alias("tag_suffix"))
    )
    vol_labels = (
        _t(spark, sf, "lineitem")
        .select(F.concat(F.lit("env=env"), (F.col("l_linenumber") % 2).cast("string")).alias("join_key"))
        .distinct()
        .select("join_key", F.lit(6).alias("stage"), F.lit("volume_labels").alias("match_type"), F.lit(" (volume_labels)").alias("tag_suffix"))
    )
    return (
        clusters.unionByName(aliases)
        .unionByName(nodes)
        .unionByName(namespaces)
        .unionByName(pod_labels)
        .unionByName(vol_labels)
    )


def _tag_cascade_best(spark: SparkSession, sf: str, unmatched: DataFrame) -> DataFrame:
    """Priority tag cascade over the not-resource-matched rows of ``unmatched``
    (p_partkey, resourcetags): explode once, semi-filter by the broadcast
    enabled-keys dim, ONE join against the unioned match dimension, one
    first-wins window. Returns (p_partkey, b_matched_tag, b_match_type)."""
    enabled = spark.createDataFrame([(k,) for k in _J12_ENABLED], ["key"])
    tags = (
        unmatched.select("p_partkey", F.explode("resourcetags"))
        .join(F.broadcast(enabled), "key")
        .withColumn("join_key", F.concat(F.col("key"), F.lit("="), F.col("value")))
    )
    matches = tags.join(_j12_match_dim(spark, sf), "join_key").select(
        "p_partkey",
        "stage",
        "key",
        F.concat(F.col("join_key"), F.col("tag_suffix")).alias("matched_tag"),
        "match_type",
    )
    w = Window.partitionBy("p_partkey").orderBy("stage", "key")
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            F.col("matched_tag").alias("b_matched_tag"),
            F.col("match_type").alias("b_match_type"),
        )
    )


def q_j12_tag_cascade(spark: SparkSession, sf: str) -> DataFrame:
    p = _t(spark, sf, "part")
    aws = p.select(
        "p_partkey",
        F.col("p_brand").like("%2").alias("rid_matched"),
        _j12_tag_map().alias("resourcetags"),
    )
    best = _tag_cascade_best(spark, sf, aws.filter(~F.col("rid_matched")))
    out = aws.join(best, "p_partkey", "left")
    return out.select(
        "p_partkey",
        F.when(F.col("rid_matched"), F.lit("resource_id"))
        .otherwise(F.coalesce("b_match_type", F.lit("unmatched")))
        .alias("match_type"),
        F.when(F.col("rid_matched"), F.lit(None).cast("string"))
        .otherwise(F.col("b_matched_tag"))
        .alias("matched_tag"),
        F.col("b_match_type").isNotNull().alias("tag_matched"),
    )


_J12_NONSPECIAL = "('openshift_cluster', 'openshift_node', 'openshift_project')"


def _j12_cascade_sql(rid_pred: str) -> str:
    """The cascade's DuckDB CTE chain (tags_raw … best), parameterized by
    the resource-id-matched predicate so both q_j12_tag_cascade and the
    composed ocp_aws_pipeline oracle share it verbatim."""
    return f"""tags_raw AS (
  SELECT p_partkey, ({rid_pred}) AS rid_matched,
    [ struct_pack(k := 'openshift_cluster',
        v := CASE WHEN p_partkey % 7 = 0 THEN 'cluster-' || CAST(p_partkey % 50 AS VARCHAR) END),
      struct_pack(k := 'openshift_node',
        v := CASE WHEN p_partkey % 5 = 0 THEN 'node-' || CAST(p_partkey % 100 AS VARCHAR) END),
      struct_pack(k := 'openshift_project',
        v := CASE WHEN p_partkey % 3 = 0 THEN 'ns-' || CAST(p_partkey % 40 AS VARCHAR) END),
      struct_pack(k := 'app', v := p_brand || '-' || CAST(p_partkey % 16 AS VARCHAR)),
      struct_pack(k := 'env', v := 'env' || CAST(p_size % 4 AS VARCHAR)),
      struct_pack(k := 'cost-center', v := 'cc-' || CAST(p_partkey % 10 AS VARCHAR)) ] AS tags
  FROM part),
exploded AS (
  SELECT p_partkey, rid_matched,
         unnest(list_filter(tags, t -> t.v IS NOT NULL)) AS t
  FROM tags_raw),
tags AS (
  SELECT p_partkey, t.k AS key, t.v AS value FROM exploded
  WHERE NOT rid_matched
    AND t.k IN ('openshift_cluster', 'openshift_node', 'openshift_project', 'app', 'env')),
clusters AS (SELECT DISTINCT 'cluster-' || CAST(s_suppkey % 30 AS VARCHAR) AS value FROM supplier),
aliases AS (SELECT DISTINCT 'cluster-' || CAST(n_nationkey % 10 + 30 AS VARCHAR) AS value FROM nation),
nodes AS (SELECT DISTINCT 'node-' || CAST(c_custkey % 60 AS VARCHAR) AS value FROM customer),
namespaces AS (SELECT DISTINCT 'ns-' || CAST(o_orderkey % 26 AS VARCHAR) AS value FROM orders),
pod_labels AS (
  SELECT DISTINCT 'app=' || p_brand || '-' || CAST(p_partkey % 16 AS VARCHAR) AS label
  FROM part WHERE p_partkey % 4 = 0),
vol_labels AS (
  SELECT DISTINCT 'env=env' || CAST(l_linenumber % 2 AS VARCHAR) AS label FROM lineitem),
matches AS (
  SELECT t.p_partkey, 1 AS stage, t.key,
         'openshift_cluster=' || t.value AS matched_tag, 'cluster_id' AS match_type
    FROM tags t JOIN clusters s USING (value) WHERE t.key = 'openshift_cluster'
  UNION ALL
  SELECT t.p_partkey, 2, t.key, 'openshift_cluster=' || t.value || ' (alias)', 'cluster_alias'
    FROM tags t JOIN aliases s USING (value) WHERE t.key = 'openshift_cluster'
  UNION ALL
  SELECT t.p_partkey, 3, t.key, 'openshift_node=' || t.value, 'node'
    FROM tags t JOIN nodes s USING (value) WHERE t.key = 'openshift_node'
  UNION ALL
  SELECT t.p_partkey, 4, t.key, 'openshift_project=' || t.value, 'project'
    FROM tags t JOIN namespaces s USING (value) WHERE t.key = 'openshift_project'
  UNION ALL
  SELECT t.p_partkey, 5, t.key, t.key || '=' || t.value || ' (pod_labels)', 'pod_labels'
    FROM tags t JOIN pod_labels s ON s.label = t.key || '=' || t.value
    WHERE t.key NOT IN {_J12_NONSPECIAL}
  UNION ALL
  SELECT t.p_partkey, 6, t.key, t.key || '=' || t.value || ' (volume_labels)', 'volume_labels'
    FROM tags t JOIN vol_labels s ON s.label = t.key || '=' || t.value
    WHERE t.key NOT IN {_J12_NONSPECIAL}),
best AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY stage, key) AS rn
  FROM matches)"""


ORACLE_J12 = f"""
WITH {_j12_cascade_sql("p_brand LIKE '%2'")},
base AS (SELECT p_partkey, (p_brand LIKE '%2') AS rid_matched FROM part)
SELECT b.p_partkey,
       CASE WHEN b.rid_matched THEN 'resource_id'
            ELSE coalesce(m.match_type, 'unmatched') END AS match_type,
       CASE WHEN b.rid_matched THEN NULL ELSE m.matched_tag END AS matched_tag,
       (m.match_type IS NOT NULL) AS tag_matched
FROM base b LEFT JOIN (SELECT * FROM best WHERE rn = 1) m USING (p_partkey)
"""


# ═════════ A4: null-key grouping parity (reference dropna=False) ═════════════
# Reference: aggregator_storage.py:313-339 — pandas groupby(dropna=False);
# both Spark and DuckDB keep NULL group keys natively, and this query pins
# that cross-engine agreement (the NaN-vs-NULL scar SURVEY §7.4#5 warns of).


def q_a4_nullkey_rollup(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    direction = (
        F.when(F.col("o_orderpriority").contains("HIGH"), "IN")
        .when(F.col("o_orderpriority").contains("LOW"), "OUT")
    )  # NULL otherwise — NULL is a real group, never dropped
    return (
        o.withColumn("direction", direction)
        .groupBy("direction", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            _isum(F.col("o_totalprice")).alias("sum_price"),
            F.max("o_orderpriority").alias("max_priority"),
        )
    )


ORACLE_A4 = f"""
SELECT CASE WHEN o_orderpriority LIKE '%HIGH%' THEN 'IN'
            WHEN o_orderpriority LIKE '%LOW%' THEN 'OUT' END AS direction,
       o_orderstatus, count(*) AS n,
       {_duck_isum('o_totalprice')} AS sum_price,
       max(o_orderpriority) AS max_priority
FROM orders GROUP BY 1, 2
"""


# ═════════════ P12: null/NaN scrub + per-column fill defaults ════════════════
# Reference: aggregator_ocp_aws.py:1074-1104 — fillna maps per column and
# np.nan→None scrubbing before writes. Nulls/NaNs are injected
# deterministically, NaN is scrubbed to NULL (isnan → NULL, the reference's
# nan_to_null), then na.fill applies the per-column defaults map.


def q_p12_null_scrub(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    qty = F.when(F.col("l_linenumber") % 5 != 0, F.col("l_quantity"))  # NULL on %5==0
    tax = F.when(F.col("l_linenumber") % 7 == 0, F.lit(float("nan"))).otherwise(F.col("l_tax"))
    flag = F.when(F.col("l_linenumber") % 3 != 0, F.col("l_returnflag"))  # NULL on %3==0
    df = li.select(
        "l_orderkey", "l_linenumber", qty.alias("qty"), tax.alias("tax"), flag.alias("flag")
    )
    df = df.withColumn("tax", F.when(F.isnan("tax"), F.lit(None)).otherwise(F.col("tax")))
    df = df.na.fill({"qty": 0.0, "tax": 0.25, "flag": "U"})
    return df.groupBy("flag").agg(
        F.count("*").alias("n"),
        _isum(F.col("qty")).alias("sum_qty"),
        _isum(F.col("tax")).alias("sum_tax"),
    )


ORACLE_P12 = f"""
WITH injected AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber % 5 != 0 THEN l_quantity END AS qty,
         CASE WHEN l_linenumber % 7 = 0 THEN 'NaN'::DOUBLE ELSE l_tax END AS tax,
         CASE WHEN l_linenumber % 3 != 0 THEN l_returnflag END AS flag
  FROM lineitem),
scrubbed AS (
  SELECT l_orderkey, l_linenumber,
         coalesce(qty, 0.0) AS qty,
         coalesce(CASE WHEN isnan(tax) THEN NULL ELSE tax END, 0.25) AS tax,
         coalesce(flag, 'U') AS flag
  FROM injected)
SELECT flag, count(*) AS n,
       {_duck_isum('qty')} AS sum_qty,
       {_duck_isum('tax')} AS sum_tax
FROM scrubbed GROUP BY flag
"""


QUERIES.update(
    {
        "j12_tag_cascade": q_j12_tag_cascade,
        "a4_nullkey_rollup": q_a4_nullkey_rollup,
        "p12_null_scrub": q_p12_null_scrub,
    }
)
ORACLES.update(
    {
        "j12_tag_cascade": ORACLE_J12,
        "a4_nullkey_rollup": ORACLE_A4,
        "p12_null_scrub": ORACLE_P12,
    }
)


# ═════════ P9: SavingsPlan / Tax line-item cost normalization ════════════════
# Reference: aws_data_loader.py:141-207 (Trino 1_resource_matching_by_cluster
# .sql lines 132-149, COST-5098) — SavingsPlanCoveredUsage rows with a valid
# positive effective cost get unblended/blended zeroed (double-counting
# guard), then calculated_amortized_cost = unblended for Tax/Usage rows and
# the SavingsPlan effective cost for everything else. Line-item type and the
# effective cost are synthesized deterministically (NULL / zero / positive
# branches all populated so the notna-AND-positive guard is exercised).


def q_p9_savingsplan_normalize(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    litype = (
        F.when(F.col("o_orderstatus") == "F", "Usage")
        .when(F.col("o_orderstatus") == "O", "SavingsPlanCoveredUsage")
        .otherwise("Tax")
    )
    sp_cost = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("double"))
        .when(F.col("o_orderkey") % 5 == 0, F.lit(0.0))
        .otherwise(F.col("o_totalprice") * 0.7)
    )
    df = o.select(
        "o_orderkey",
        litype.alias("litype"),
        sp_cost.alias("sp_cost"),
        F.col("o_totalprice").alias("unblended"),
        (F.col("o_totalprice") * 0.98).alias("blended"),
    )
    covered = (
        (F.col("litype") == "SavingsPlanCoveredUsage")
        & F.col("sp_cost").isNotNull()
        & (F.col("sp_cost") > 0)
    )
    df = df.withColumn(
        "unblended", F.when(covered, 0.0).otherwise(F.col("unblended"))
    ).withColumn("blended", F.when(covered, 0.0).otherwise(F.col("blended")))
    amortized = F.when(
        F.col("litype").isin("Tax", "Usage"), F.col("unblended")
    ).otherwise(F.col("sp_cost"))
    return (
        df.withColumn("amortized", amortized)
        .groupBy("litype")
        .agg(
            F.count("*").alias("n"),
            _isum(F.col("unblended")).alias("sum_unblended"),
            _isum(F.col("blended")).alias("sum_blended"),
            _isum(F.coalesce(F.col("amortized"), F.lit(0.0))).alias("sum_amortized"),
        )
    )


ORACLE_P9 = f"""
WITH base AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 'Usage'
              WHEN o_orderstatus = 'O' THEN 'SavingsPlanCoveredUsage'
              ELSE 'Tax' END AS litype,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              WHEN o_orderkey % 5 = 0 THEN 0.0
              ELSE o_totalprice * 0.7 END AS sp_cost,
         o_totalprice AS unblended0,
         o_totalprice * 0.98 AS blended0
  FROM orders),
zeroed AS (
  SELECT *,
         CASE WHEN litype = 'SavingsPlanCoveredUsage' AND sp_cost IS NOT NULL
                   AND sp_cost > 0 THEN 0.0 ELSE unblended0 END AS unblended,
         CASE WHEN litype = 'SavingsPlanCoveredUsage' AND sp_cost IS NOT NULL
                   AND sp_cost > 0 THEN 0.0 ELSE blended0 END AS blended
  FROM base),
amort AS (
  SELECT *, CASE WHEN litype IN ('Tax', 'Usage') THEN unblended
                 ELSE sp_cost END AS amortized
  FROM zeroed)
SELECT litype, count(*) AS n,
       {_duck_isum('unblended')} AS sum_unblended,
       {_duck_isum('blended')} AS sum_blended,
       {_duck_isum("coalesce(amortized, 0.0)")} AS sum_amortized
FROM amort GROUP BY litype
"""


QUERIES.update({"p9_savingsplan_normalize": q_p9_savingsplan_normalize})
ORACLES.update({"p9_savingsplan_normalize": ORACLE_P9})


# ═════════ composed flagship: the reference's full OCP-on-AWS pipeline ═══════
# Reference: aggregator_ocp_aws.py:162-220 + main.py:151-592 — the product is
# the CHAIN, not the phases: load → resource-id matching (resource_matcher.py,
# J11 suffix cascade) → tag matching for the remainder (tag_matcher.py, J12
# cascade) → capacity derivation (disk_capacity_calculator.py, A7) → cost
# attribution by ratio (cost_attributor.py:519-573, W1) → network/storage
# cost split + five-frame attribution with per-cost-type markup
# (network_cost_handler.py:51-93, aggregator_ocp_aws.py:741-924,
# cost_attributor.py:582 markup) → summary union + formatting (main.py:433-470
# U2, db_writer.py:435 F12). Round 2 proved each phase as an isolated
# oracle-paired query; this one query composes them so cross-phase
# interactions (join order, null propagation, window-over-join) are
# oracle-checked end to end. Round 4 added the reference's full phase 6: the
# five attribution frames (compute / network-unattributed / CSI storage /
# tag-matched storage / untagged storage) that the reference builds as five
# pandas DataFrames and concats collapse here into ONE classified
# aggregation — a single CASE column + one groupBy over one pass of the cost
# fact, instead of five scans.
#
# Scale shape: the suffix match is a broadcast theta join against a 3-row
# dim; the cascade is the fused single equi join of _tag_cascade_best; A7 is
# a partial-agg rollup of the big fact; attribution is one window keyed by
# match_type; the per-part `attributed` frame is persisted via the bounded
# memo (operators/cache.py) because TWO branches consume it — the capacity
# summary and the cost classification — and an unpersisted plan would
# re-execute the whole match→cascade→capacity upstream per branch (the r3
# plan sweep read 62 shuffles / 18 scans pre-AQE; with the memo the
# upstream runs once into cache and each branch is an InMemoryTableScan).
# The summary's TOTAL row comes from rollup() grouping sets — one
# aggregation, no self-union.


_OCP_MARKUP = 0.1  # reference default markup (cost_attributor.py:46,582)


def _ocp_attributed(spark: SparkSession, sf: str) -> DataFrame:
    """Phases 1-4: per-part (match_type, matched_tag, capacity, share)."""
    p = _t(spark, sf, "part")
    aws = p.select("p_partkey", "p_brand", _j12_tag_map().alias("resourcetags"))
    # phase 1: resource-id suffix match, priority first-wins (J11)
    dim = spark.createDataFrame(_SUFFIXES, ["suffix", "priority"])
    j = aws.join(F.broadcast(dim), F.col("p_brand").endswith(F.col("suffix")), "left")
    w = Window.partitionBy("p_partkey").orderBy(F.col("priority").asc_nulls_last())
    first = j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    matched = first.select(
        "p_partkey",
        "resourcetags",
        F.when(
            F.col("suffix").isNotNull(), F.concat(F.lit("resource:"), F.col("suffix"))
        ).alias("rmatch"),
    )
    # phase 2: tag cascade over the unmatched remainder (J12, fused join)
    best = _tag_cascade_best(spark, sf, matched.filter(F.col("rmatch").isNull()))
    labeled = matched.join(best, "p_partkey", "left").select(
        "p_partkey",
        F.coalesce("rmatch", "b_match_type", F.lit("unmatched")).alias("match_type"),
        F.when(F.col("rmatch").isNull(), F.col("b_matched_tag")).alias("matched_tag"),
    )
    # phase 3: capacity derivation from the lineitem fact (A7)
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.max("l_extendedprice").alias("max_cost"), F.max("l_discount").alias("max_rate")
    )
    cap = F.round(F.col("max_cost") / (F.col("max_rate") * 730.0 + 1.0)).cast("long")
    capacities = agg.select("l_partkey", cap.alias("capacity")).filter(
        F.col("capacity") > 0
    )
    enriched = labeled.join(
        capacities, labeled.p_partkey == capacities.l_partkey, "left"
    ).select(
        "p_partkey",
        "match_type",
        "matched_tag",
        F.coalesce("capacity", F.lit(0)).alias("capacity"),
    )
    # phase 4: ratio attribution within each match_type (W1) — capacities
    # are exact longs, so the window sum is order-independent
    denom = F.sum("capacity").over(Window.partitionBy("match_type"))
    return enriched.withColumn(
        "share", F.col("capacity") / F.nullif(denom, F.lit(0))
    )


def q_ocp_aws_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from .cache import memo_frame

    attributed = memo_frame(
        "ocp_attributed", spark, sf, lambda: _ocp_attributed(spark, sf)
    )
    # phase 5: per-type capacity summary + TOTAL via rollup() grouping sets
    # (one aggregation — the r3 union form re-executed the upstream twice)
    # + money formatting (F12)
    g = F.grouping("match_type")
    summary = (
        attributed.rollup("match_type")
        .agg(
            g.alias("_g"),
            F.count("*").alias("n"),
            F.sum("capacity").alias("total_capacity"),
            _isum(F.coalesce(F.col("share"), F.lit(0.0))).alias("_share"),
            F.min("matched_tag").alias("_tag"),
        )
        .select(
            F.lit("capacity").alias("cost_type"),
            F.when(F.col("_g") == 1, "TOTAL").otherwise(F.col("match_type")).alias("bucket"),
            "n",
            "total_capacity",
            # the reference's total row carries no share/tag detail
            F.when(F.col("_g") == 0, F.col("_share")).alias("share_sum"),
            F.when(F.col("_g") == 0, F.col("_tag")).alias("first_tag"),
            F.format_string("%d.000000000", F.col("total_capacity")).alias(
                "capacity_decimal"
            ),
            F.lit(None).cast("double").alias("sum_cost"),
            F.lit(None).cast("double").alias("markup_cost"),
        )
    )
    # phase 6 (r4): network/storage cost split + five-frame attribution.
    # Cost fact = lineitem rows joined to the per-part match state;
    # data_transfer_direction ≅ shipmode-derived (nullable, like the
    # reference's column), EBS-storage flag ≅ shipinstruct-derived.
    li = _t(spark, sf, "lineitem")
    costs = li.select(
        "l_partkey",
        F.col("l_extendedprice").alias("cost"),
        # data_transfer_direction analog (nullable, mostly-NULL like the
        # reference's): R→IN, A→OUT, N (the majority flag) → NULL
        F.when(F.col("l_returnflag") == "R", "IN")
        .when(F.col("l_returnflag") == "A", "OUT")
        .alias("direction"),
        # EBS-usagetype analog: a deterministic minority subset of rows
        (F.col("l_linenumber") % 3 == 0).alias("is_storage"),
    ).join(
        # broadcast the per-part match state (r7): it is a dimension — one
        # row per part, three narrow columns, served from the memo cache —
        # and the planner otherwise SMJ-shuffled the 6M-row cost fact
        # against it (259 MB exchange + sort, profiled as the query's
        # largest stage). The reference's analog is per-resource state
        # loaded from PostgreSQL, dimension-sized at any corpus scale.
        F.broadcast(attributed.select("p_partkey", "match_type", "matched_tag")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    # ONE classification pass replaces the reference's five frames:
    #   network    — direction present (network_cost_handler.filter_network_costs)
    #   compute    — non-network, non-EBS (aggregator_ocp_aws.py:797-805)
    #   storage_csi— EBS on a resource-matched part (CSI handle analog)
    #   storage_tag— EBS, tag-matched (attribute_tag_matched_storage)
    #   storage_untagged — EBS, matched neither (attribute_untagged_storage)
    is_net = F.col("direction").isNotNull() & (F.col("direction") != "")
    cost_type = (
        F.when(is_net, "network")
        .when(~F.col("is_storage"), "compute")
        .when(F.col("match_type").startswith("resource:"), "storage_csi")
        .when(F.col("matched_tag").isNotNull(), "storage_tag")
        .otherwise("storage_untagged")
    )
    bucket = (
        F.when(is_net, F.concat(F.lit("Network unattributed/"), F.col("direction")))
        .when(~F.col("is_storage"), F.col("match_type"))
        .when(F.col("match_type").startswith("resource:"), F.col("match_type"))
        .when(F.col("matched_tag").isNotNull(), F.col("matched_tag"))
        .otherwise(F.lit("Storage unattributed"))
    )
    cost_rollup = (
        costs.select(cost_type.alias("cost_type"), bucket.alias("bucket"), "cost")
        .groupBy("cost_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            _isum(F.col("cost")).alias("sum_cost"),
            # per-cost-type markup (cost_attributor.py:582): per-row double
            # product is bit-identical cross-engine; fixed-point sum exact
            _isum(F.col("cost") * F.lit(_OCP_MARKUP)).alias("markup_cost"),
        )
        .select(
            "cost_type",
            "bucket",
            "n",
            F.lit(None).cast("long").alias("total_capacity"),
            F.lit(None).cast("double").alias("share_sum"),
            F.lit(None).cast("string").alias("first_tag"),
            F.lit(None).cast("string").alias("capacity_decimal"),
            "sum_cost",
            "markup_cost",
        )
    )
    return summary.unionByName(cost_rollup)


ORACLE_OCP_AWS_PIPELINE = f"""
WITH dim(suffix, priority) AS (VALUES ('2', 1), ('5', 2), ('7', 3)),
rmatch AS (
  SELECT p_partkey, 'resource:' || suffix AS rmatch FROM (
    SELECT p.p_partkey, d.suffix,
           row_number() OVER (PARTITION BY p.p_partkey ORDER BY d.priority) AS rn
    FROM part p JOIN dim d ON p.p_brand LIKE '%' || d.suffix)
  WHERE rn = 1),
{_j12_cascade_sql("p_partkey IN (SELECT p_partkey FROM rmatch)")},
labeled AS (
  SELECT p.p_partkey,
         coalesce(r.rmatch, m.match_type, 'unmatched') AS match_type,
         CASE WHEN r.rmatch IS NULL THEN m.matched_tag END AS matched_tag
  FROM part p
  LEFT JOIN rmatch r USING (p_partkey)
  LEFT JOIN (SELECT * FROM best WHERE rn = 1) m USING (p_partkey)),
capacities AS (
  SELECT l_partkey,
         CAST(round(max(l_extendedprice) / (max(l_discount) * 730.0 + 1.0)) AS BIGINT) AS capacity
  FROM lineitem GROUP BY l_partkey
  HAVING CAST(round(max(l_extendedprice) / (max(l_discount) * 730.0 + 1.0)) AS BIGINT) > 0),
enriched AS (
  SELECT l.p_partkey, l.match_type, l.matched_tag,
         coalesce(c.capacity, 0) AS capacity
  FROM labeled l LEFT JOIN capacities c ON l.p_partkey = c.l_partkey),
attributed AS (
  SELECT *, capacity / nullif(CAST(sum(capacity)
              OVER (PARTITION BY match_type) AS BIGINT), 0) AS share
  FROM enriched),
summary AS (
  SELECT CASE WHEN GROUPING(match_type) = 1 THEN 'TOTAL' ELSE match_type END AS bucket,
         count(*) AS n,
         CAST(sum(capacity) AS BIGINT) AS total_capacity,
         CASE WHEN GROUPING(match_type) = 1 THEN NULL
              ELSE {_duck_isum("coalesce(share, 0.0)")} END AS share_sum,
         CASE WHEN GROUPING(match_type) = 1 THEN NULL
              ELSE min(matched_tag) END AS first_tag
  FROM attributed GROUP BY ROLLUP(match_type)),
costs AS (
  SELECT li.l_extendedprice AS cost,
         CASE WHEN li.l_returnflag = 'R' THEN 'IN'
              WHEN li.l_returnflag = 'A' THEN 'OUT' END AS direction,
         (li.l_linenumber % 3 = 0) AS is_storage,
         a.match_type, a.matched_tag
  FROM lineitem li JOIN attributed a ON li.l_partkey = a.p_partkey),
classified AS (
  SELECT cost,
         CASE WHEN direction IS NOT NULL AND direction <> '' THEN 'network'
              WHEN NOT is_storage THEN 'compute'
              WHEN match_type LIKE 'resource:%' THEN 'storage_csi'
              WHEN matched_tag IS NOT NULL THEN 'storage_tag'
              ELSE 'storage_untagged' END AS cost_type,
         CASE WHEN direction IS NOT NULL AND direction <> ''
                THEN 'Network unattributed/' || direction
              WHEN NOT is_storage THEN match_type
              WHEN match_type LIKE 'resource:%' THEN match_type
              WHEN matched_tag IS NOT NULL THEN matched_tag
              ELSE 'Storage unattributed' END AS bucket
  FROM costs),
cost_rollup AS (
  SELECT cost_type, bucket, count(*) AS n,
         {_duck_isum('cost')} AS sum_cost,
         {_duck_isum(f'cost * {_OCP_MARKUP}')} AS markup_cost
  FROM classified GROUP BY 1, 2)
SELECT 'capacity' AS cost_type, bucket, n, total_capacity, share_sum, first_tag,
       printf('%d.000000000', total_capacity) AS capacity_decimal,
       CAST(NULL AS DOUBLE) AS sum_cost, CAST(NULL AS DOUBLE) AS markup_cost
FROM summary
UNION ALL
SELECT cost_type, bucket, n, NULL, NULL, NULL, NULL, sum_cost, markup_cost
FROM cost_rollup
"""

QUERIES.update({"ocp_aws_pipeline": q_ocp_aws_pipeline})
ORACLES.update({"ocp_aws_pipeline": ORACLE_OCP_AWS_PIPELINE})
