"""Window-function operators (SURVEY.md §2.B B-28..B-32).

One shuffle per distinct (partitionBy, orderBy) pair; Catalyst chains
window functions sharing a spec into a single Window exec node. Scale
note: every window here partitions by a high-cardinality key (nation,
user, customer) so state per partition stays bounded at 100 TB.

Determinism (§5.3 rule 3): every orderBy carries a unique-key tiebreak;
windowed double sums run in DECIMAL(18,2) over the raw 2dp-exact value
column (frame-order accumulation differs between Spark's buffering and
DuckDB's segment trees — decimal addition is order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents, dec
from cloudtrail_streamer_spark.registry import query

_RANK_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  CAST(rank() OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


@query("win_rank", oracle=_RANK_ORACLE, survey_id="B-28")
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_ANALYTIC_ORACLE = """
SELECT
  event_id,
  user_id,
  ts,
  value,
  lag(value) OVER w AS prev_value,
  lead(value) OVER w AS next_value,
  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("win_analytic", oracle=_ANALYTIC_ORACLE, survey_id="B-29")
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wfull).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
    )


_FRAME_ROWS_ORACLE = """
SELECT
  event_id,
  user_id,
  ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("win_frame_rows", oracle=_FRAME_ROWS_ORACLE, survey_id="B-30")
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving sum/avg per user (ROWS frame), decimal-exact."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    msum = F.sum(dec("value")).over(w).cast("double")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        msum.alias("mov_sum"),
        (msum / F.count(F.lit(1)).over(w)).alias("mov_avg"),
    )


_FRAME_RANGE_ORACLE = """
SELECT
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
       (ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS DOUBLE) AS running_total
FROM orders
WHERE o_orderstatus = 'F'
"""


@query("win_frame_range", oracle=_FRAME_RANGE_ORACLE, survey_id="B-31")
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame running total: peers by o_orderdate value share the
    same running sum (that's what distinguishes RANGE from ROWS).

    Unpartitioned global window — fine here, but the 100 TB shape is the
    partitioned variant (B-30); kept global to exercise the frame type.
    """
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    w = (
        Window.orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


_TOPN_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM customer JOIN orders ON o_custkey = c_custkey
) t
WHERE rn <= 3
"""


@query("top_n_per_group", oracle=_TOPN_ORACLE, survey_id="B-32")
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter. Catalyst pushes a
    per-partition top-k (WindowGroupLimit) below the shuffle, so the
    exchange carries ≤k rows per key at scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
    )


_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_seq
"""


@query("win_sessionize", oracle=_SESSIONIZE_ORACLE, survey_id="B-28-ext")
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >30-min silence per user; session id = running count of
    session starts. The batch counterpart of B-47's session_window —
    one shuffle keyed by user, two window passes over the same spec
    (Catalyst fuses them into one sort). Gap arithmetic is exact
    integer MICROSECONDS (unix_micros / epoch_us) on both engines —
    second-granularity casts would disagree on subsecond rows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0)
    sess_seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_seq", sess_seq.cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t_view
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS BIGINT) AS funnel_stage
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@query("win_pattern_funnel", oracle=_FUNNEL_ORACLE, survey_id="B-29-ext")
def win_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase): per user, the
    first view, the first click strictly AFTER that view, the first
    purchase strictly after that click, and the deepest stage reached.

    Sequential dependency means one window pass can't do it; instead
    three stage aggregates chained by keyed joins. Each stage input is
    pre-filtered to one event_type and pre-aggregated to ≤1 row per
    user before joining, so every join is |users|-sized regardless of
    event volume — the funnel cost at 100 TB is three scans (or one
    scan + two re-reads of a |users| intermediate), never an
    event-by-event self-join. MIN is tie-safe: determinism needs no
    extra tiebreak (SURVEY §5.3)."""
    ev = table(spark, sf_dir, "events")
    # s1/s2 each feed two subtrees (the next stage + the final join);
    # persisted so the plan is the advertised three pushed-filter scans
    # plus |users|-sized cache re-reads, not six fact scans
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .persist()
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .persist()
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("long")
            .alias("funnel_stage"),
        )
    )


_MOVING_MEDIAN_ORACLE = """
WITH w7 AS (
  SELECT user_id, ts, event_id,
         list_sort(list(CAST(round(value * 100, 0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vals
  FROM events
)
SELECT user_id, event_id,
       CAST(len(vals) AS BIGINT) AS n_window,
       CAST(CASE WHEN len(vals) % 2 = 1
                 THEN 2 * vals[(len(vals) + 1) // 2]
                 ELSE vals[len(vals) // 2] + vals[len(vals) // 2 + 1]
            END AS BIGINT) AS median2_cents
FROM w7
"""


@query("win_median_moving", oracle=_MOVING_MEDIAN_ORACLE, survey_id="B-30-ext")
def win_median_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT moving median over a 7-row frame per user — the robust
    smoother percentile_approx can't give deterministically: the frame's
    cents values are collected (bounded: ≤7 per row), sorted, and the
    median read by index; emitted DOUBLED (2×median) so even-sized
    frames stay in exact integer arithmetic instead of a .5 float.
    Bounded-frame collect is the honest trade: the per-row state is
    O(frame), never O(partition), so the operator scales with frame
    size, not data size. Same (ts, event_id) total order in both
    engines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    vals = F.array_sort(F.collect_list(cents("value")).over(w))
    n = F.size(vals)
    median2 = (
        F.when(
            n % 2 == 1, 2 * F.element_at(vals, ((n + 1) / 2).cast("int"))
        ).otherwise(
            F.element_at(vals, (n / 2).cast("int"))
            + F.element_at(vals, (n / 2 + 1).cast("int"))
        )
    )
    return ev.select(
        "user_id",
        "event_id",
        n.cast("long").alias("n_window"),
        median2.cast("long").alias("median2_cents"),
    )
