"""Sort / limit / top-k / set operators (SURVEY.md §2.B B-33..B-37).

Scale notes: global sort is a range-partitioned shuffle (Spark samples
boundaries); ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
per-partition top-k then a k-row merge at the driver, never a full sort
at 100 TB. Set ops are hash shuffles on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

_SORT_ORACLE = """
SELECT
  o_orderkey,
  NULLIF(o_orderstatus, 'P') AS status_nullable,
  o_orderpriority,
  o_totalprice
FROM orders
ORDER BY status_nullable ASC NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey
"""


@query("sort_multikey", oracle=_SORT_ORACLE, survey_id="B-33")
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering on a derived nullable."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nullable"),
        "o_orderpriority",
        "o_totalprice",
    ).orderBy(
        F.col("status_nullable").asc_nulls_first(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey"),
    )


_TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
ORDER BY revenue DESC, l_orderkey, l_linenumber
LIMIT 100
"""


@query("limit_topk", oracle=_TOPK_ORACLE, survey_id="B-34")
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by computed revenue (TakeOrderedAndProject).

    §5.3 rule 4: LIMIT only under a total order — (revenue, l_orderkey,
    l_linenumber) is a unique sort key.
    """
    l = table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        l.select("l_orderkey", "l_linenumber", revenue)
        .orderBy(F.col("revenue").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


_UNION_ALL_ORACLE = """
SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS src FROM customer
UNION ALL
SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS src FROM supplier
"""


@query("set_union_all", oracle=_UNION_ALL_ORACLE, survey_id="B-35")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (no shuffle — just plan concatenation)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("src"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("src"),
    )
    return c.unionByName(s)


_UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_union_distinct", oracle=_UNION_DISTINCT_ORACLE, survey_id="B-35")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) = unionByName + distinct (hash shuffle on key)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_intersect", oracle=_INTERSECT_ORACLE, survey_id="B-36")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_except", oracle=_EXCEPT_ORACLE, survey_id="B-37")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


_EXCEPT_ALL_ORACLE = """
SELECT o_orderstatus AS st FROM orders
EXCEPT ALL
SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 2 = 0
"""


@query("set_except_all", oracle=_EXCEPT_ALL_ORACLE, survey_id="B-37")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (duplicate-count preserving)."""
    o = table(spark, sf_dir, "orders")
    a = o.select(F.col("o_orderstatus").alias("st"))
    b = o.where(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderstatus").alias("st"))
    return a.exceptAll(b)


_INTERSECT_ALL_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_intersect_all", oracle=_INTERSECT_ALL_ORACLE, survey_id="B-36")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (each nationkey kept
    min(count_left, count_right) times), completing the set-op matrix
    (union/union-all/intersect/except/except-all were already
    registered). Spark plans intersectAll as a left-semi-style join on
    per-side counts; both engines implement the same ANSI min-count
    rule, which the hash check pins."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)
