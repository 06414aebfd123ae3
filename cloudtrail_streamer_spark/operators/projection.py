"""Projection / filter / predicate operators (SURVEY.md §2.B B-7..B-9).

The reference's only per-record transform is envelope unwrapping (A-7,
upstream ``main.go:~150-165`` approx); these are the generalized
expression-level operators. All pure Catalyst expressions — whole-stage
codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

_PROJECT_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS revenue,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
  l_quantity * 2.5 + 1 AS scaled_qty
FROM lineitem
"""


@query("project_compute", oracle=_PROJECT_ORACLE, survey_id="B-7")
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection; identical IEEE expression order both engines
    (no aggregation → raw double outputs are bit-stable cross-engine)."""
    l = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
    )


_FILTER_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
FROM part
WHERE (p_type LIKE 'PROMO%' OR p_brand IN ('Brand#1', 'Brand#3'))
  AND p_size BETWEEN 5 AND 40
  AND NOT (p_retailprice < 900.0)
  AND p_name IS NOT NULL
"""


@query("filter_compound", oracle=_FILTER_ORACLE, survey_id="B-8")
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    ).where(
        (F.col("p_type").like("PROMO%") | F.col("p_brand").isin("Brand#1", "Brand#3"))
        & F.col("p_size").between(5, 40)
        & ~(F.col("p_retailprice") < 900.0)
        & F.col("p_name").isNotNull()
    )


_COND_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice < 50000 THEN 'low'
       WHEN o_totalprice < 150000 THEN 'mid'
       ELSE 'high' END AS price_bucket,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
  CAST(o_orderkey AS VARCHAR) AS key_str
FROM orders
"""


@query("filter_conditional_expr", oracle=_COND_ORACLE, survey_id="B-9")
def filter_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + coalesce/nullif + explicit casts.

    Cross-engine trap (SURVEY.md §5.3 rule 6): double→int CAST truncates
    in Spark but rounds in DuckDB — always FLOOR explicitly first.
    """
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp < 50000, "low").when(tp < 150000, "mid").otherwise("high").alias("price_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.floor(tp).cast("long").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )
