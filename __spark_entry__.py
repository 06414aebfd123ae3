"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``cloudtrail_streamer_spark.registry``). The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloudtrail_streamer_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 over lineitem, SURVEY.md B-20) on sf0.001."""
    return all_queries()["agg_group_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per H-tier query (Tier R ops are omitted)."""
    return all_oracles()
