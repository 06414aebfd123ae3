"""TPC-H query shapes 2/6/7/8/11/12/13/15/16/17/20/21/22 — the rest of
the composite-pipeline suite begun in ``tpch.py`` (Q1/3/4/5/9/10/14/18/19).

The upstream reference is a ~300-LoC Go forwarder with no query surface
(SURVEY §2.A), so these pin the ENGINE's compositional guarantees: every
classic TPC-H plan shape — correlated scalar subqueries, global-fraction
HAVING, anti-join "not exists", distribution histograms, per-group
min/max qualification — expressed Spark-first and hash-checked against
DuckDB on the same parquet.

Fixture adaptations (FIXTURES.md — no partsupp, no l_commitdate /
l_receiptdate / l_shipmode, no c_phone, no p_container / p_mfgr):

- Q2/Q11/Q16/Q20: supplier-part "offers" are derived from lineitem
  (GROUP BY l_partkey, l_suppkey) instead of partsupp — same plan shape
  (a pre-aggregated bridge table feeding the main join tree).
- Q12: l_returnflag stands in for l_shipmode; "late" means
  l_shipdate > o_orderdate + 30 days (receipt/commit dates don't exist).
- Q21: "kept waiting" = sole holder of the order's latest ship date on a
  multi-supplier 'F' order (no receipt/commit to compare against).
- Q22: the country-code prefix becomes c_nationkey ∈ {1,3,5,7,9}.

Money math is integer cents end-to-end (``functions.cents``) with ONE
final double cast, mirrored in each oracle, per SURVEY §5.3 rule 2;
quantities are integral doubles so comparisons like q < 0.2·avg(q) are
restated as exact BIGINT cross-products (q·5·n < Σq) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


# revenue in integer hundredths-of-cents: cents(price) * (100 - cents(disc))
def _rev_c() -> F.Column:
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


_REV_SQL = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-filter-aggregate
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE, survey_id="B-20-ext")
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical scan-dominated query — every predicate
    (shipdate range, discount band, quantity cap) reaches the parquet
    scan as a PushedFilter, so at 100 TB the job is I/O-bound on the
    pruned row groups and the aggregate is a single partial+final pair
    with a 1-row shuffle. The discount band compares integer cents, not
    raw doubles (§5.3 rule 6)."""
    li = table(spark, sf_dir, "lineitem")
    disc_c = cents("l_discount")
    f = li.where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & disc_c.between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (F.sum(cents("l_extendedprice") * disc_c).cast("double") / 10000.0).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_c) AS DOUBLE) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         {_REV_SQL} AS vol_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7_volume_shipping", oracle=_Q7_ORACLE, survey_id="B-10-ext")
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: a 6-table snowflake with a disjunctive cross-nation
    predicate. Both nation legs are 25-row broadcasts, so the only big
    shuffles are lineitem↔orders and orders↔customer; the nation-pair
    filter is applied after the broadcasts, where it prunes ~92% of
    pairs before the final small agg. Group-by cardinality is
    2 pairs × years — a trivial final shuffle at any scale."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, c.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_c()).cast("double") / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_c ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(vol_c) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         {_REV_SQL} AS vol_c,
         n2.n_name AS nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type LIKE 'ECONOMY%'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("tpch_q8_market_share", oracle=_Q8_ORACLE, survey_id="B-10-ext")
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-table snowflake ending in a conditional-share
    aggregate. The market-share numerator is a CASE branch of the same
    integer-cents sum, so numerator and denominator come out of ONE
    aggregation pass and the ratio is a single deterministic double
    division (§5.3 rule 2). nation/region are broadcast; the p_type
    filter prunes part before its join so only ~1/6 of partkeys enter
    the build side. At 100 TB the plan is two big hash joins
    (lineitem↔orders via orderkey, orders↔customer via custkey) plus
    broadcasts — no shuffle carries more than the filtered fact."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type").like("ECONOMY%")).select(
        "p_partkey"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cust_nations = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = F.broadcast(
        n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    )
    vol = _rev_c()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cust_nations, F.col("c_nationkey") == F.col("cn_key"))
        .join(supp_nation, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (offers derived from lineitem)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       CAST(cost_c AS DOUBLE) / 100.0 AS supplycost
FROM offers
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE p_size <= 5 AND p_type LIKE 'STANDARD%' AND r_name = 'EUROPE'
QUALIFY cost_c = MIN(cost_c) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


@query("tpch_q2_min_cost_supplier", oracle=_Q2_ORACLE, survey_id="B-32-ext")
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated "cost = MIN(cost) over this part"
    qualification. The partsupp bridge is derived from lineitem (GROUP BY
    partkey,suppkey — FIXTURES.md has no partsupp), then part/region
    filters prune BEFORE the per-part min-window, so the window state is
    only the filtered offer set. Spark expresses the correlated scalar
    subquery as a window MIN + filter — one shuffle on p_partkey instead
    of a re-scan per part, which is the scale-correct rewrite (a
    correlated rescan at 100 TB is O(parts·scan)). Total-ordered top-20
    per §5.3 rules 3-4."""
    li = table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_c")
    )
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 5) & F.col("p_type").like("STANDARD%")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = F.broadcast(
        s.join(F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.join(p, offers.l_partkey == p.p_partkey)
        .join(eu_supp, offers.l_suppkey == F.col("s_suppkey"))
        .withColumn("min_cost_c", F.min("cost_c").over(w))
        .where(F.col("cost_c") == F.col("min_cost_c"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("cost_c").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: global-fraction HAVING
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH vals AS (
  SELECT l.l_partkey AS p_key,
         SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS value_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey = 7
  GROUP BY l.l_partkey
)
SELECT p_key, CAST(value_c AS DOUBLE) / 100.0 AS part_value
FROM vals
WHERE value_c * 1000 > (SELECT SUM(value_c) FROM vals)
ORDER BY part_value DESC, p_key
"""


@query("tpch_q11_important_stock", oracle=_Q11_ORACLE, survey_id="B-20-ext")
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep parts whose inventory value exceeds a
    FRACTION OF THE GLOBAL TOTAL (value·1000 > Σvalue — integer
    cross-multiplication, no float fraction, §5.3 rule 6). The global
    scalar is a window SUM over the per-part aggregate (cardinality =
    #parts, not #lineitems), so the base lineitem↔supplier join and the
    per-part agg run exactly once — no recomputed subtree, no collect.
    The supplier filter (nationkey=7) broadcasts and prunes the fact
    before the agg shuffle."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 7).select(
        "s_suppkey"
    )
    vals = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(cents("l_extendedprice")).alias("value_c"))
    )
    total = F.sum("value_c").over(Window.partitionBy())
    return (
        vals.withColumn("total_c", total)
        .where(F.col("value_c") * 1000 > F.col("total_c"))
        .select("p_key", (F.col("value_c").cast("double") / 100.0).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_key")
    )


# ---------------------------------------------------------------------------
# Q12 — late shipments by return-flag class
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("tpch_q12_late_shipments", oracle=_Q12_ORACLE, survey_id="B-20-ext")
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_returnflag stands in for l_shipmode, and
    "late" = shipped >30 days after the order date — the fixtures carry
    no commit/receipt dates). Priority splits are CASE branches of one
    aggregation pass. The year filter pushes to the scan; the
    cross-column lateness predicate evaluates post-join in codegen.
    Midnight-valued timestamps make the +30 DAY comparison exact on
    both engines."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("tpch_q13_order_distribution", oracle=_Q13_ORACLE, survey_id="B-12-ext")
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution-of-counts — a LEFT join whose unmatched
    rows MUST survive (zero-order customers are the point), then two
    stacked aggregations. COUNT(o_orderkey) counts non-null matches on
    both engines. The filter lives in the JOIN CONDITION, not a WHERE
    (a WHERE would silently drop the NULL-extended rows — the classic
    outer-join bug, pinned here cross-engine). At 100 TB the first agg
    shuffles on c_custkey; the second on the tiny count domain."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarter revenue
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
           AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_c AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON s_suppkey = supplier_no
WHERE total_c = (SELECT MAX(total_c) FROM revenue)
ORDER BY s_suppkey
"""


@query("tpch_q15_top_supplier", oracle=_Q15_ORACLE, survey_id="B-32-ext")
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: argmax over an aggregated view — revenue per supplier
    for one quarter, then the supplier(s) hitting the global MAX. The
    scalar MAX is a window over the per-supplier aggregate (cardinality
    = #suppliers), so the quarter's lineitem scan happens exactly once.
    Ties all surface (WHERE =, not LIMIT 1), ordered by s_suppkey for
    determinism. Exact integer cents make the MAX comparison
    tie-stable across engines."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_c()).alias("total_c")
    )
    mx = F.max("total_c").over(Window.partitionBy())
    return (
        rev.withColumn("max_c", mx)
        .where(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, split_part(p_type, ' ', 1) AS p_type_class, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1, 2, 3, 4, 5)
GROUP BY p_brand, p_type_class, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type_class, p_size
LIMIT 25
"""


@query("tpch_q16_supplier_part_counts", oracle=_Q16_ORACLE, survey_id="B-21-ext")
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part-attribute
    group, with the supplier-part relationship derived from lineitem.
    Spark plans distinct-aggregate as expand+two-phase (partial distinct
    per partition first), so the shuffle carries (group, suppkey) pairs
    — already deduplicated map-side — not raw lineitems. Brand/size
    filters push to the part scan; part is the broadcast side.
    Total-ordered top-25 (§5.3 rules 3-4)."""
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("p_type_class"),
            "p_size",
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type_class", "p_size")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH li AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS price_c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#13'
),
stats AS (
  SELECT l_partkey, SUM(qty) AS sum_q, COUNT(*) AS n_q
  FROM li GROUP BY l_partkey
)
SELECT round(CAST(SUM(price_c) AS DOUBLE) / 700.0, 4) AS avg_yearly,
       COUNT(*) AS n_small
FROM li JOIN stats USING (l_partkey)
WHERE qty * 5 * n_q < sum_q
"""


@query("tpch_q17_small_qty_revenue", oracle=_Q17_ORACLE, survey_id="B-20-ext")
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated "quantity < 0.2 × AVG(quantity) for
    this part" subquery, rewritten as a per-part window aggregate — one
    shuffle on partkey instead of a rescan per part. The float
    comparison is restated as the exact integer cross-product
    q·5·n < Σq (quantities are integral doubles, §5.3 rule 6), so both
    engines pick the identical row set. Brand filter broadcasts part
    and prunes lineitem before the window shuffle. /7.0 yearly-average
    division happens ONCE at the end, rounded to 4 dp."""
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            cents("l_extendedprice").alias("price_c"),
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("sum_q", F.sum("qty").over(w))
        .withColumn("n_q", F.count(F.lit(1)).over(w))
        .where(F.col("qty") * 5 * F.col("n_q") < F.col("sum_q"))
        .agg(
            F.round(F.sum("price_c").cast("double") / 700.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant promo-part volume
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_name, n.n_name
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type LIKE 'PROMO%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
)
ORDER BY s.s_name
"""


@query("tpch_q20_promo_part_suppliers", oracle=_Q20_ORACLE, survey_id="B-14-ext")
def tpch_q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a HAVING-qualified aggregate feeding a
    SEMI-join (IN-subquery). The promo/date filters prune the fact
    before the (suppkey, partkey) agg; the qualified supplier-key set is
    tiny, so Spark's left-semi broadcasts it against supplier — the
    supplier table itself never shuffles. At 100 TB the only big
    exchange is the fact agg on its natural composite key."""
    p = table(spark, sf_dir, "part").where(F.col("p_type").like("PROMO%")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    qualified = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_q"))
        .where(F.col("sum_q") > 50)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH per_supp AS (
  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS s_max
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
with_max AS (
  SELECT l_orderkey, l_suppkey, s_max,
         MAX(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per_supp
),
marked AS (
  SELECT l_suppkey, s_max, o_max, n_supp,
         SUM(CASE WHEN s_max = o_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM with_max
)
SELECT s.s_name, COUNT(*) AS numwait
FROM marked m JOIN supplier s ON s.s_suppkey = m.l_suppkey
WHERE m.s_max = m.o_max AND m.n_supp > 1 AND m.n_at_max = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("tpch_q21_suppliers_waiting", oracle=_Q21_ORACLE, survey_id="B-28-ext")
def tpch_q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS(another supplier) AND NOT-EXISTS(anyone
    later) — rewritten from the classic double-correlated-subquery form
    into ONE window pass over a per-(order,supplier) aggregate: a
    supplier "kept the order waiting" iff it is the SOLE holder of the
    order's latest ship date on a multi-supplier finished order. The
    correlated rescans become o_max / n_supp / n_at_max over one
    orderkey partition — the rewrite that turns O(orders·scan) into one
    shuffle at 100 TB. The fixtures carry no receipt/commit dates, so
    lateness is defined purely on ship dates (module docstring)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = (
        per_supp.withColumn("o_max", F.max("s_max").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("s_max") == F.col("o_max"), 1).otherwise(0)
            ).over(w),
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        marked.where(
            (F.col("s_max") == F.col("o_max"))
            & (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH pool AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
),
threshold AS (
  SELECT CAST(SUM(bal_c) AS DOUBLE) / COUNT(*) AS avg_c
  FROM pool WHERE bal_c > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM pool, threshold
WHERE CAST(bal_c AS DOUBLE) > avg_c
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("tpch_q22_dormant_customers", oracle=_Q22_ORACLE, survey_id="B-15-ext")
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: above-average-balance customers WITH NO ORDERS —
    scalar subquery (the positive-balance average, computed in exact
    integer cents then one double division) + ANTI join against recent
    orders. "No orders at all" is vacuous in the fixtures (every
    customer ordered), so dormancy = no orders since 2000-01-01 — the
    date filter prunes the anti-join build side to the recent slice.
    The 1-row threshold broadcasts; the anti join is the only shuffle
    touching orders and it projects o_custkey alone. c_nationkey stands
    in for the phone country-code prefix (FIXTURES.md has no c_phone).
    At 100 TB this is scan-prune → broadcast-compare → anti-join on the
    natural key; no correlated rescan survives the rewrite."""
    pool = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select("c_custkey", "c_nationkey", cents("c_acctbal").alias("bal_c"))
    )
    thr = pool.where(F.col("bal_c") > 0).agg(
        (F.sum("bal_c").cast("double") / F.count(F.lit(1))).alias("avg_c")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thr))
        .where(F.col("bal_c").cast("double") > F.col("avg_c"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
