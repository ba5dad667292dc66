"""Operators BEYOND the reference's inventory — capabilities a full engine
(and a large-scale training-data pipeline) needs that the reference never
implemented (SURVEY.md §2.3 "Missing vs full engines: no sort-merge join
selection, no as-of / range / interval joins"; §2.4 "No grouping sets /
cube / rollup"). Each with a DuckDB oracle, same determinism policy as
relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import _duck_isum, _isum, _t


# ───────────────────────────── as-of join ────────────────────────────────────
# For each event, the latest order of that user at or before the event time.
# Spark lacks a native ASOF join; this is the union-and-sweep plan: tag both
# sides, union, ONE sort per user partition, and carry the latest order
# forward with last(ignorenulls). The naive composition (theta-join on
# ts ≥ o_orderdate then row_number keep-latest) materializes event × ALL
# earlier orders per user before the filter — quadratic on a hot user; the
# sweep is O((|E|+|O|) log) per user and shuffles once on user_id. At 100 TB
# bucket both tables on the key and the sort happens within buckets.


def q_j19_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),  # events sort AFTER same-instant orders
        "event_id",
        "event_type",
    )
    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        "o_orderkey",
        "o_totalprice",
    )
    both = ev.unionByName(o, allowMissingColumns=True)
    # total order: time, then orders-before-events (ts ≥ o_orderdate is
    # inclusive), then orderkey asc so the GREATEST key at an equal date is
    # the one carried forward (same tie-break as the window formulation)
    w = Window.partitionBy("uid").orderBy(
        F.col("t"),
        F.col("kind"),
        F.col("o_orderkey").asc_nulls_first(),
        F.col("event_id").asc_nulls_first(),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = both.select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(cum).alias("m_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(cum).alias("m_price"),
    )
    hits = swept.filter(F.col("kind") == 1)
    return (
        hits.withColumn("matched", F.col("m_orderkey").isNotNull())
        .groupBy("event_type", "matched")
        .agg(
            F.count("*").alias("n"),
            _isum(F.coalesce(F.col("m_price"), F.lit(0.0))).alias("sum_price"),
        )
    )


# DuckDB has native ASOF JOIN — which is itself a nice differential check:
# two independent implementations of the operator must agree. Tie-breaking:
# ASOF picks the greatest o_orderdate ≤ ts but is agnostic among equal
# dates, so the oracle re-derives with the same explicit window instead.
ORACLE_J19 = f"""
WITH joined AS (
  SELECT e.event_id, e.event_type, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
SELECT event_type, o_orderkey IS NOT NULL AS matched, count(*) AS n,
       {_duck_isum('coalesce(o_totalprice, 0.0)')} AS sum_price
FROM joined WHERE rn = 1 GROUP BY 1, 2
"""


# ───────────────────────────── range join ────────────────────────────────────
# Events joined to value-band dimension rows on lo ≤ value < hi. Broadcast
# nested-loop with a range predicate; at scale: bin the fact side to the
# band grid first so the join becomes equi (standard range-bucketing).


_BANDS = [(0.0, 5.0, "low"), (5.0, 20.0, "mid"), (20.0, 1e9, "high")]


def q_j20_range_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    bands = spark.createDataFrame(_BANDS, ["lo", "hi", "band"])
    joined = ev.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        "inner",
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n"), _isum(F.col("value")).alias("sum_value")
    )


ORACLE_J20 = f"""
WITH bands(lo, hi, band) AS (VALUES (0.0, 5.0, 'low'), (5.0, 20.0, 'mid'), (20.0, 1000000000.0, 'high'))
SELECT band, count(*) AS n, {_duck_isum('value')} AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band
"""


# ─────────────────────────── sessionization ──────────────────────────────────
# Gap-based sessions per user (30-minute inactivity): session id = running
# count of gap-starts — one window sort per user partition, the canonical
# distributed sessionization (streaming twin: session_window /
# applyInPandasWithState).


def q_w4_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→long via TZ cast
    ts_s = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(ts_s) - F.min(ts_s)).alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.max("duration_s").alias("max_duration_s"),
    )


# NB: Spark's timestamp→long cast truncates to whole seconds; the oracle
# must truncate too (raw epoch() keeps microseconds → off-by-one sessions
# at fractional gaps).
ORACLE_W4 = """
WITH secs AS (
  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events),
flagged AS (
  SELECT user_id, event_id, ts_s,
         CASE WHEN ts_s - lag(ts_s) OVER w IS NULL
                OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM secs WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(ts_s) - min(ts_s) AS duration_s
  FROM sess GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       max(duration_s) AS max_duration_s
FROM per_session GROUP BY user_id
"""


# ───────────────────────────── grouping sets ─────────────────────────────────
# SURVEY §2.4: the reference has none; Spark/DuckDB both do.


def q_a16_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    gs = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count("*").alias("n"), _isum(F.col("l_quantity")).alias("sum_qty"))
    return gs.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "n",
        "sum_qty",
    )


ORACLE_A16 = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       {_duck_isum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ──────────────────────────────── pivot ──────────────────────────────────────
# Spark-native pivot; oracle as portable CASE sums.


def q_a17_pivot(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn("usage_date", F.to_date("ts"))
    piv = (
        ev.groupBy("usage_date")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return (
        piv.withColumnsRenamed({"click": "n_click", "view": "n_view", "error": "n_error"})
        .withColumn("usage_date", F.col("usage_date").cast("string"))
    )


ORACLE_A17 = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS usage_date,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY 1
"""


QUERIES = {
    "j19_asof_join": q_j19_asof_join,
    "j20_range_join": q_j20_range_join,
    "w4_sessionization": q_w4_sessionization,
    "a16_grouping_sets": q_a16_grouping_sets,
    "a17_pivot": q_a17_pivot,
}

ORACLES = {
    "j19_asof_join": ORACLE_J19,
    "j20_range_join": ORACLE_J20,
    "w4_sessionization": ORACLE_W4,
    "a16_grouping_sets": ORACLE_A16,
    "a17_pivot": ORACLE_A17,
}
