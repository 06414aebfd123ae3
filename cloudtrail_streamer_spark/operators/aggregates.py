"""Aggregation operators (SURVEY.md §2.B B-20..B-27).

The reference has zero aggregation (SURVEY.md §2.A closing note — it is a
record forwarder, upstream ``main.go`` approx ~300 LoC total). These are
the engine-scope hash-aggregate operators mandated by BASELINE.json's
north star. Catalyst plans all of these as partial+final hash aggregates
(map-side combine) automatically — at 100 TB the shuffle moves only the
pre-aggregated group states, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents, davg, dsum
from cloudtrail_streamer_spark.registry import query

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
    / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) AS DOUBLE)
    / 1000000.0 AS sum_charge,
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
    # Exact fixed-point arithmetic on raw-column casts (§5.3 rule 2):
    # integer-cents products are exact on both engines AND an order of
    # magnitude faster than Spark's Decimal path; the oracle mirrors the
    # same BIGINT formulation so the final double cast is identical.
    # Never cast a computed double to decimal.
    epc = cents("l_extendedprice")
    disc_c = epc * (F.lit(100) - cents("l_discount"))
    charge_c = disc_c * (F.lit(100) + cents("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            (F.sum(disc_c).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_c).cast("double") / 1000000.0).alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", scale=4),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_DISTINCT_ORACLE = """
SELECT o_orderstatus AS status, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 'ALL' AS status, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
"""


@query("agg_distinct", oracle=_DISTINCT_ORACLE, survey_id="B-21")
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group + global (expand-then-aggregate plan).

    At scale: Catalyst rewrites distinct-agg as a two-phase expand +
    partial agg, so the shuffle carries (status, custkey) pairs once.
    """
    o = table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers")
    )
    glob = o.agg(F.countDistinct("o_custkey").cast("long").alias("n_customers")).select(
        F.lit("ALL").alias("status"), "n_customers"
    )
    return per.unionByName(glob)


_ROLLUP_ORACLE = """
SELECT
  n_regionkey AS regionkey,
  n_nationkey AS nationkey,
  CAST(GROUPING(n_regionkey, n_nationkey) AS BIGINT) AS gid,
  CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_regionkey, n_nationkey)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE, survey_id="B-22")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation with grouping_id (bitmask matches DuckDB)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    j = n.join(c, c.c_nationkey == n.n_nationkey, "left")
    return j.rollup(
        F.col("n_regionkey").alias("regionkey"), F.col("n_nationkey").alias("nationkey")
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("c_custkey").cast("long").alias("n_customers"),
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus AS status,
  o_orderpriority AS priority,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@query("agg_cube", oracle=_CUBE_ORACLE, survey_id="B-23")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "total"),
    )


_GSETS_ORACLE = """
SELECT event_type, user_id, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())
"""


@query("agg_grouping_sets", oracle=_GSETS_ORACLE, survey_id="B-24")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point (SURVEY.md §3.2 —
    SQL and DataFrame converge at the unresolved logical plan)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_GSETS_ORACLE)


_STATS_ORACLE = """
SELECT
  l_returnflag,
  CAST(MIN(l_linenumber) AS BIGINT) AS min_ln,
  CAST(MAX(l_linenumber) AS BIGINT) AS max_ln,
  CAST(SUM(CAST(l_linenumber AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_ln,
  sqrt((SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT))
        - CAST(SUM(CAST(l_linenumber AS BIGINT)) AS DOUBLE) * SUM(CAST(l_linenumber AS BIGINT)) / COUNT(*))
       / (COUNT(*) - 1)) AS stddev_ln,
  (SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT))
   - CAST(SUM(CAST(l_linenumber AS BIGINT)) AS DOUBLE) * SUM(CAST(l_linenumber AS BIGINT)) / COUNT(*))
  / (COUNT(*) - 1) AS var_ln,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_stats", oracle=_STATS_ORACLE, survey_id="B-25")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev_samp/var_samp from EXACT integer moments.

    Native stddev accumulates doubles in partition-merge order (varies
    under parallelism) — instead sum x and x² as exact BIGINTs, then one
    fixed double expression both engines evaluate identically (§5.3).
    """
    l = table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    s1 = F.sum(ln)
    s2 = F.sum(ln * ln)
    cnt = F.count(F.lit(1))
    var = (s2 - s1.cast("double") * s1 / cnt) / (cnt - 1)
    return l.groupBy("l_returnflag").agg(
        F.min(ln).alias("min_ln"),
        F.max(ln).alias("max_ln"),
        (s1.cast("double") / cnt).alias("avg_ln"),
        F.sqrt(var).alias("stddev_ln"),
        var.alias("var_ln"),
        cnt.alias("n"),
    )


_COLLECT_ORACLE = """
SELECT
  n_name,
  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
  COUNT(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@query("agg_collect_sorted", oracle=_COLLECT_ORACLE, survey_id="B-26")
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array (§5.3 rule 4 — never collect unsorted),
    emitted as a joined string for cross-engine value stability."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_custkey")), ",").alias("custkeys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_APPROX_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1.0 AS DOUBLE) AS hll_ratio_1dp,
       CAST(1.0 AS DOUBLE) AS gk_ratio_1dp
FROM orders
GROUP BY 1
"""


@query("agg_approx", oracle=_APPROX_ORACLE, survey_id="B-27")
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + percentile_approx (GK sketch).

    At 100 TB these replace exact distinct/percentile: fixed-size sketch
    state, single shuffle of sketches, mergeable across partitions.

    Tier H via a realized-error certificate (upgraded r9 from the
    r1-era rows-only check, VERDICT r08 #3): raw sketch outputs are
    engine-specific (Spark HLL++ vs DuckDB approx_distinct draw
    different estimates), so the hashed columns are the estimate/exact
    RATIOS rounded to 1 dp — exactly 1.0 iff the realized relative
    error is inside ±5% — which the oracle pins to 1.0. A sketch
    drifting past its bound (or a regression that swaps the sketch for
    a wrong column) hash-mismatches in the driver gate instead of
    hiding behind a rows-only row. rsd=0.01 makes the 5% window a 5σ
    bound (agg_approx_bounds precedent); sketches are deterministic
    for fixed input, so the ratios are stable across runs.

    r11 plan note: countDistinct must NOT share an ``agg`` with the
    sketches. Catalyst's distinct rewrite re-keys the partial phase by
    (group, distinct-col), so every (status, custkey) pair — |customers|
    groups, not |statuses| — carried a 2^14-register HLL++ buffer
    (rsd 0.01 → p=14 → 16 KB each) plus both percentile buffers:
    gigabytes of sketch-state allocation for a 3-row result (52 s at
    sf0.1). The exact distinct now runs as its own two-level aggregate
    over 12-byte keys and rejoins on the 3-row status key, leaving the
    sketch buffers at one per status."""
    o = table(spark, sf_dir, "orders")
    sk = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
    )
    # exact distinct: map-side dedup of (status, custkey), then a count
    # per status — countDistinct semantics exactly (nulls don't count)
    ex = (
        o.where(F.col("o_custkey").isNotNull())
        .select(F.col("o_orderstatus").alias("status"), "o_custkey")
        .distinct()
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("exact_customers"))
    )
    agg = sk.join(ex, "status", "left").withColumn(
        "exact_customers", F.coalesce("exact_customers", F.lit(0))
    )
    return agg.select(
        "status",
        "n",
        F.round(
            F.col("approx_customers").cast("double") / F.col("exact_customers"), 1
        ).alias("hll_ratio_1dp"),
        F.round(
            F.col("approx_median").cast("double") / F.col("exact_median"), 1
        ).alias("gk_ratio_1dp"),
    )


_APPROX_BOUNDS_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS hll_within_5pct,
       TRUE AS gk_within_5pct
FROM orders
GROUP BY 1
"""


@query("agg_approx_bounds", oracle=_APPROX_BOUNDS_ORACLE, survey_id="B-27-ext")
def agg_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible error-bound certificate for the B-27 sketches:
    one pass computes BOTH the sketch estimate (HLL++ count-distinct,
    GK approximate median) and the exact value, then emits the exact
    values plus within-5%% booleans. The DuckDB oracle recomputes the
    exact columns and pins the booleans to TRUE, so a sketch drifting
    past its error bound hash-mismatches in the correctness gate —
    unlike ``agg_approx`` (rows-only), whose <5%% assertion lives only
    in tests/test_engine.py. Sketches are deterministic for fixed
    input, so the booleans are stable across runs.

    r11 plan note: the exact distinct is split out of the sketch
    ``agg`` for the same reason as ``agg_approx`` — sharing one agg
    re-keys the partial phase by (status, custkey) and replicates the
    16 KB HLL++ buffer per customer group."""
    o = table(spark, sf_dir, "orders")
    sk = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        # rsd=0.01 → the 5% certificate is a 5σ bound; the default 0.05
        # rsd is a 1σ bound that genuinely misses 5% at small groups.
        F.approx_count_distinct("o_custkey", 0.01).alias("hll_customers"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
        F.percentile_approx("o_totalprice", 0.5).alias("gk_median"),
    )
    ex = (
        o.where(F.col("o_custkey").isNotNull())
        .select(F.col("o_orderstatus").alias("status"), "o_custkey")
        .distinct()
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("exact_customers"))
    )
    agg = sk.join(ex, "status", "left").withColumn(
        "exact_customers", F.coalesce("exact_customers", F.lit(0))
    )
    rel_err = lambda est, exact: F.abs(F.col(est) - F.col(exact)) / F.col(exact)  # noqa: E731
    return agg.select(
        "status",
        "n",
        "exact_customers",
        (rel_err("hll_customers", "exact_customers") <= 0.05).alias("hll_within_5pct"),
        (rel_err("gk_median", "exact_median") <= 0.05).alias("gk_within_5pct"),
    )


_TIME_BUCKET_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch_us(ts) / 300000000.0) AS BIGINT) * 300000000)
         AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM events
GROUP BY 1, 2
"""


@query("agg_time_bucket", oracle=_TIME_BUCKET_ORACLE, survey_id="B-20-ext")
def agg_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: events into epoch-aligned
    5-minute buckets per type — the continuous-aggregate shape
    (timescale's time_bucket / Spark's window()) as a plain keyed agg.
    Bucket boundaries computed in exact integer microseconds on both
    engines, so bucket membership is bit-identical. One partial+final
    hash agg; at 100 TB pre-partition the sink by bucket date for
    pruned reads downstream."""
    ev = table(spark, sf_dir, "events")
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / 300000000.0) * 300000000).cast("long")
    )
    return ev.groupBy(
        bucket.alias("bucket_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


_HLL_UNION_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
"""


@query("agg_hll_union_sketch", oracle=_HLL_UNION_ORACLE, survey_id="B-27-ext")
def agg_hll_union_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the property that matters at
    100 TB: per-(type, day) HLL sketches built independently (as they
    would be, one per ingest partition/day), then merged with
    hll_union_agg and estimated — no re-scan of history to refresh a
    rolling cardinality. The driver row is a certificate: within_5pct
    must come back true for every type, and the exact count is
    hash-checked against DuckDB; the raw estimate is engine-internal
    (Datasketches HLL) so it stays out of the compared columns."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_5pct"),
    )


_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
)
SELECT event_type,
       CAST(LEAST(9, CAST(floor((value - mn) * 10 / (mx - mn)) AS BIGINT))
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events, b
GROUP BY 1, 2
"""


@query("agg_histogram", oracle=_HISTOGRAM_ORACLE, survey_id="B-25-ext")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10 buckets over the observed global range)
    per event_type. The global min/max come from a 1-row aggregate
    broadcast back onto the feed (the engine's standard no-collect
    pattern for global-stat-dependent transforms), then one partial+
    final count keyed by (type, bucket) — two passes total, both
    scan-shaped, which is the profile-at-100 TB requirement. Bucket
    arithmetic is floor() on the same double expression in both engines
    (SURVEY §5.3 rule 6)."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("value") - F.col("mn")) * 10 / (F.col("mx") - F.col("mn"))).cast(
            "long"
        ),
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_MODE_ORACLE = """
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       CAST(n AS BIGINT) AS n
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
) t
WHERE rn = 1
"""


@query("agg_mode_argmax", oracle=_MODE_ORACLE, survey_id="B-25-ext")
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact mode per group. Built-in mode() is
    tie-nondeterministic in BOTH engines, so the engine's contract form
    is count-then-argmax with a total-order tiebreak (count desc, then
    value) — two keyed aggregations that shuffle only |groups x values|
    rows after map-side partials; never a per-row sort at scale."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n"),
        )
    )


_OBSERVE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS observed_rows,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS observed_cents,
       CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS observed_negative
FROM events
"""


@query("agg_observe_metrics", oracle=_OBSERVE_ORACLE, survey_id="A-11-ext")
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via DataFrame.observe — the A-11
    logging analog for BATCH jobs (the streaming listener covers
    micro-batches): named aggregates piggyback on a real pass over the
    data at zero extra scan cost, surfacing row counts / money totals /
    data-quality counters to the driver exactly as a production job
    exports them to its metrics system. The certificate row returns the
    OBSERVED values themselves, hash-checked against DuckDB recomputing
    the same aggregates — proving the observation carried the true
    numbers, not a sample."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("pipeline_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("value")).alias("c"),
        F.sum((F.col("value") < 0).cast("long")).alias("neg"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real pass
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n"]), int(m["c"]), int(m["neg"]))],
        "observed_rows long, observed_cents long, observed_negative long",
    )


_THETA_ORACLE = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS in_b
  FROM events
  WHERE event_type IN ('purchase', 'error')
  GROUP BY user_id
)
SELECT
  CAST(SUM(CASE WHEN in_a = 1 OR in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_union_exact,
  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intersect_exact,
  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_diff_exact,
  TRUE AS union_ok,
  TRUE AS intersect_ok,
  TRUE AS diff_ok
FROM flags
"""


@query("agg_theta_sketch_setops", oracle=_THETA_ORACLE, survey_id="B-27-ext")
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches — distinct counting with SET ALGEBRA, the
    capability HLL lacks: |A∪B|, |A∩B|, and |A\\\\B| of the purchasing vs
    erroring user populations, each estimated from two independently
    built sketches. At 100 TB the sketches are built once per
    partition/day (mergeable, like agg_hll_union_sketch) and any
    audience-overlap question is then answered sketch-side in O(k)
    without rescanning either population — the standard Datasketches
    pattern for audience/cohort overlap. The driver row is a
    certificate: each estimate must land within max(5%, 2) of the exact
    answer (theta sketches at default lgK=12 are exact below 4096
    uniques, so locally these are equalities), with the exact counts
    hash-checked against DuckDB."""
    ev = table(spark, sf_dir, "events")
    a_cond = F.col("event_type") == "purchase"
    b_cond = F.col("event_type") == "error"
    sk = ev.where(a_cond | b_cond).agg(
        F.theta_sketch_agg(F.when(a_cond, F.col("user_id"))).alias("ska"),
        F.theta_sketch_agg(F.when(b_cond, F.col("user_id"))).alias("skb"),
    )
    est = sk.select(
        F.theta_sketch_estimate(F.theta_union(F.col("ska"), F.col("skb"))).alias("e_u"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ska"), F.col("skb"))
        ).alias("e_i"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ska"), F.col("skb"))
        ).alias("e_d"),
    )
    exact = (
        ev.where(a_cond | b_cond)
        .groupBy("user_id")
        .agg(
            F.max(a_cond.cast("int")).alias("in_a"),
            F.max(b_cond.cast("int")).alias("in_b"),
        )
        .agg(
            F.sum(((F.col("in_a") == 1) | (F.col("in_b") == 1)).cast("long"))
            .cast("long")
            .alias("n_union_exact"),
            F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long"))
            .cast("long")
            .alias("n_intersect_exact"),
            F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 0)).cast("long"))
            .cast("long")
            .alias("n_diff_exact"),
        )
    )

    def ok(est_col: str, exact_col: str):
        tol = F.greatest(F.lit(2.0), 0.05 * F.col(exact_col))
        return F.abs(F.col(est_col) - F.col(exact_col)) <= tol

    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "n_union_exact",
            "n_intersect_exact",
            "n_diff_exact",
            ok("e_u", "n_union_exact").alias("union_ok"),
            ok("e_i", "n_intersect_exact").alias("intersect_ok"),
            ok("e_d", "n_diff_exact").alias("diff_ok"),
        )
    )


# ---------------------------------------------------------------------------
# agg_listagg_ordered — native ordered string aggregation (round 7)
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT n_nationkey,
       string_agg(c_name, '|' ORDER BY c_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_nationkey
"""


@query("agg_listagg_ordered", oracle=_LISTAGG_ORACLE, survey_id="B-26-ext")
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ordered string aggregation — Spark 4's ``listagg(expr,
    sep) WITHIN GROUP (ORDER BY ...)`` (the ANSI form), vs this repo's
    earlier ``concat_ws(sort_array(collect_list(...)))`` composition
    (agg_string_concat): one declarative aggregate, the sort contract
    in the SQL itself (§5.3 rule 4 — no collect_list without an
    explicit order). Plan shape is the same partial+final agg; the
    WITHIN GROUP order is enforced engine-side rather than by a bolted
    array sort. At 100 TB the caveat is unchanged from collect_list:
    the aggregate state is the concatenated group — fine for bounded
    groups (names per nation), wrong for unbounded ones."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).createOrReplaceTempView(
        "cust_nation_la"
    )
    return spark.sql(
        """
        SELECT n_nationkey,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS members,
               COUNT(*) AS n
        FROM cust_nation_la
        GROUP BY n_nationkey
        """
    )
