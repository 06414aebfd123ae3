"""Aggregation operators (SURVEY.md §2.B B-20..B-27).

The reference has zero aggregation (SURVEY.md §2.A closing note — it is a
record forwarder, upstream ``main.go`` approx ~300 LoC total). These are
the engine-scope hash-aggregate operators mandated by BASELINE.json's
north star. Catalyst plans all of these as partial+final hash aggregates
(map-side combine) automatically — at 100 TB the shuffle moves only the
pre-aggregated group states, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import davg, dec, dsum
from cloudtrail_streamer_spark.registry import query

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_group_q1", oracle=_Q1_ORACLE, survey_id="B-20")
def agg_group_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter → project → partial/final hash agg → sort.

    Flagship query (SURVEY.md §7 slice 0). Money math per §5.3 rule 2:
    decimal-exact sums emitted as DOUBLE; averages as sum/count.
    """
    l = table(spark, sf_dir, "lineitem")
    # Exact decimal arithmetic on raw-column casts (§5.3 rule 2): the
    # product of decimals is exact on both engines; never cast a computed
    # double to decimal.
    disc_price = dec("l_extendedprice", 2, 12) * (F.lit(1) - dec("l_discount", 2, 8))
    charge = disc_price * (F.lit(1) + dec("l_tax", 2, 8))
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", scale=4),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
