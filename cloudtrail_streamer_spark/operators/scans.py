"""Scan / source / sink operators (SURVEY.md §2.B B-1, B-2, B-5).

Generalizes the reference's source/sink path: S3 object fetch + gzip +
parse (A-5..A-7, upstream ``main.go:~120-165`` approx) becomes a Catalyst
parquet scan with pushdown; the partition-keyed Kinesis write (A-9/A-10,
``main.go:~60-100``) becomes a partitioned parquet write.

Scale notes: B-2's filter+projection reach the parquet reader
(``PushedFilters`` / ``ReadSchema`` asserted in tests/test_plans.py), so
at 100 TB the scan skips row groups and never materializes dead columns.
B-5's ``partitionBy`` is the layout that makes downstream partition
pruning (and DPP) possible.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM lineitem", survey_id="B-1")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns — the identity plan (vectorized reader)."""
    return table(spark, sf_dir, "lineitem")


_PRUNED_ORACLE = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


@query("scan_pruned", oracle=_PRUNED_ORACLE, survey_id="B-2")
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + predicate pushdown into the parquet reader."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    ).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )


@query("sink_parquet_partitioned", oracle="SELECT * FROM events", survey_id="B-5")
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + read-back round trip (A-9/A-10 analog).

    ``partitionBy(event_type)`` is the hive-style layout CloudTrail uses
    on S3 (region/date keys); read-back restores the partition column.
    """
    ev = table(spark, sf_dir, "events")
    out = os.path.join(tempfile.mkdtemp(prefix="cts_sink_"), "events_parted")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out)
    # partitionBy turns the partition column into a directory key; restore
    # original column order + types (partition values read back as strings
    # unless schema inference is on — select with explicit cast).
    return back.select(
        "event_id",
        "ts",
        "user_id",
        F.col("event_type").cast("string").alias("event_type"),
        "value",
        "props",
    )
