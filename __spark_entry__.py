"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join on sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2 + training-pipeline extensions) for the DuckDB correctness
gate at sf=0.01. Implementation lives in poc_parquet_aggregator_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# python workers spawned by an externally-created SparkSession must also be
# able to import the package
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from poc_parquet_aggregator_spark.operators import ORACLES, QUERIES  # noqa: E402
from poc_parquet_aggregator_spark.operators.relational import (  # noqa: E402
    q_star_join_revenue,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_star_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ dedup /
    similarity / text / multimodal extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI-SQL oracle per query — every queries() entry is paired
    (simhash and the rolling-hash fingerprint became oracle-expressible in
    round 2 via md5-substring hashing + BIGINT bit ops)."""
    return dict(ORACLES)
