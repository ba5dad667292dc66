"""Operator inventory exposed to the driver harness.

Each SURVEY.md §2 operator (and each training-pipeline extra) is a named
query: a DataFrame function ``fn(spark, sf_dir)`` paired with an ANSI-SQL
DuckDB oracle. Collected here into the registries __spark_entry__ exports.
"""

from . import dedup, extended, multimodal, packing, relational, similarity, textstats

QUERIES = {}
ORACLES = {}
for _m in (relational, extended, dedup, similarity, textstats, multimodal, packing):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
