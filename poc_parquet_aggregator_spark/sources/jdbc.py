"""JDBC dimension-table adapter (SURVEY.md §2 S11).

The reference reads small control dimensions from PostgreSQL — enabled tag
keys and cost-category rules (/root/reference/src/db_writer.py:80-165) —
and joins them against the big fact frames. Spark's native path is
``spark.read.jdbc``; this sandbox ships no JDBC driver JAR, so like
sources/iceberg.py this module is the SEAM where a real cluster plugs in:
the dispatch, option plumbing, and failure modes are real and unit-tested,
the wire protocol needs only the driver on the classpath.

Scale notes: control dimensions are tiny → read on the driver-side executor
once and ``broadcast()`` into every join (exactly what the relational
queries do with their in-memory dims). A genuinely large JDBC table must be
range-partitioned (``partition_column`` + bounds → one cursor per task) or
it serializes through a single connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: common driver classes, keyed by the jdbc:<scheme> prefix
_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
    "trino": "io.trino.jdbc.TrinoDriver",
    # Spark bundles Derby (hive metastore) — the one wire-level JDBC engine
    # available in this sandbox, so the round-trip test runs a REAL write +
    # read-back, not just the dispatch seam
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


def _scheme(url: str) -> str:
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url (expected jdbc:<scheme>:...): {url!r}")
    return url.split(":", 2)[1]


def driver_class_for(url: str) -> str | None:
    return _DRIVERS.get(_scheme(url))


def has_jdbc_driver(spark: SparkSession, driver_class: str) -> bool:
    """True when the given JDBC driver class is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_jdbc_dimension(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a dimension table over JDBC.

    ``table`` may be a table name or a pushed-down subquery alias
    (``"(SELECT key FROM enabled_tag_keys WHERE enabled) t"``) — the
    reference's enabled-keys query (db_writer.py:80-113) is exactly that
    shape. Fails with a clear RuntimeError when the driver JAR is absent
    (spark-submit --packages org.postgresql:postgresql:42.7.x) instead of an
    opaque ClassNotFoundException mid-scan.
    """
    driver = driver or driver_class_for(url)
    if driver is None:
        raise ValueError(
            f"no known driver for jdbc scheme {_scheme(url)!r}; pass driver="
        )
    if not has_jdbc_driver(spark, driver):
        raise RuntimeError(
            f"JDBC driver {driver} not on the classpath; add it via "
            "spark-submit --packages (e.g. org.postgresql:postgresql:42.7.3) "
            "or --jars"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    reader = reader.option("driver", driver)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(Spark JDBC range partitioning)"
            )
        # parallel range scan: one cursor per task — required for big tables
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_summary_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Write a SUMMARY frame to a relational table over JDBC — the writer
    twin of read_jdbc_dimension, covering the reference's COPY/INSERT sink
    (/root/reference/src/db_writer.py:167-304). The reference bulk-loads
    its daily summary rows into PostgreSQL; the engine's ENCODED blobs
    deliberately go to Parquet + manifest instead (SURVEY §1.1 north rule),
    but the small relational summaries a dashboard reads still want the DB
    path.

    Scale notes: summaries are post-aggregation (thousands of rows, not the
    fact table) — ``coalesce(num_partitions or 4)`` bounds the connection
    count, and ``batchsize`` maps to the JDBC batch INSERT size (the Spark
    analog of the reference's COPY buffering, db_writer.py:216-249). Fails
    with the same clear no-driver RuntimeError as the read side.
    """
    if mode not in ("append", "overwrite", "ignore", "error", "errorifexists"):
        raise ValueError(f"invalid save mode {mode!r}")
    spark = df.sparkSession
    driver = driver or driver_class_for(url)
    if driver is None:
        raise ValueError(
            f"no known driver for jdbc scheme {_scheme(url)!r}; pass driver="
        )
    if not has_jdbc_driver(spark, driver):
        raise RuntimeError(
            f"JDBC driver {driver} not on the classpath; add it via "
            "spark-submit --packages (e.g. org.postgresql:postgresql:42.7.3) "
            "or --jars"
        )
    writer = (
        df.coalesce(num_partitions or 4)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()


def enabled_tag_keys(
    spark: SparkSession, url: str | None = None, local: list[str] | None = None
) -> DataFrame:
    """The reference's enabled-tag-keys dimension (db_writer.py:80-113):
    from PostgreSQL when a url is given, else from the provided local list
    (the sandbox/test path — exactly what q_j12_tag_cascade broadcasts)."""
    if url is not None:
        return read_jdbc_dimension(
            spark, url, "(SELECT key FROM enabled_tag_keys WHERE enabled) t"
        )
    if local is None:
        raise ValueError("either url or local must be given")
    return spark.createDataFrame([(k,) for k in local], ["key"])
