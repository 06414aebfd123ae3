"""Engine-capability extensions (round 3, waves 5-6).

Capabilities a production analytics engine is expected to carry beyond
the query surface already registered, grouped by family:

- **Maintenance / lakehouse**: ``mv_incremental_refresh`` (algebraic MV
  merge, no base rescan), ``sink_dynamic_partition_overwrite``
  (partition-scoped replace), ``dq_constraint_suite`` (Deequ-style
  violation-count gate).
- **Fuzzy / similarity**: ``join_fuzzy_symdelete`` (SymSpell deletion-
  neighborhood blocking), ``dedup_semantic_ivf`` (SemDeDup cluster-
  scoped cosine pairs), ``embed_matryoshka_recall`` (truncated-dim
  retrieval certificate).
- **Time series**: ``events_interpolate_linear`` (spine-bounded linear
  fill), ``events_cusum_changepoint`` (CUSUM drift argmax),
  ``win_streak_longest`` (gaps-and-islands), ``join_asof_tolerance``
  (staleness-capped as-of), ``win_percent_change_yoy`` (calendar lag).
- **Exact statistics**: ``agg_regression_ols`` / ``agg_moments_exact``
  (BIGINT power sums → bit-stable OLS and skew/kurtosis),
  ``agg_entropy_peruser`` (ordered-fold float sum),
  ``agg_gini_coefficient`` (rank-weighted inequality),
  ``agg_bitmap_distinct`` (popcount distinct).
- **Text / pretrain**: ``text_encode_ids`` (vocab + numericalize),
  ``text_pmi_bigrams`` (collocation PMI).
- **Graph**: ``graph_triangle_count`` (degree-oriented wedge join).
- **SQL parity traps**: ``sql_not_in_nulls`` (three-valued logic),
  ``sql_distinct_on_first`` (DISTINCT ON translation),
  ``fn_timezone_convert`` (ICU tz conversion).

The upstream reference (a ~300-LoC Go S3→Kinesis forwarder, SURVEY
§2.A) has none of this; these extend §2.B the way BASELINE.json's north
star directs. Determinism per SURVEY §5.3 throughout: integer partial
aggregates wherever sums cross partitions, ordered folds where floats
must sum, one final rounded double per metric.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import scratch_dir, table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query


# ---------------------------------------------------------------------------
# mv_incremental_refresh — algebraic MV maintenance
# ---------------------------------------------------------------------------

_MV_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_price,
       COUNT(*) AS n_rows,
       round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 4)
         AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("mv_incremental_refresh", oracle=_MV_ORACLE, survey_id="B-20-ext")
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the MV holds ALGEBRAIC
    partial states (sum_qty, sum_price_c, n_rows — all BIGINT-exact), a
    delta batch aggregates to the same states, and refresh is a
    states-union + re-aggregate keyed on the group — the base table is
    never rescanned. AVG is NOT stored (it does not merge); it derives
    from sum/count after the merge, which is what makes the refresh
    equal a full recompute bit-for-bit. Here the "materialized" half is
    lineitem shipped before 2000-01-01 and the delta is everything
    after; the oracle is the full recompute over the whole table — the
    merge-equals-recompute contract IS the hash check. At 100 TB the
    refresh cost is O(delta scan + |groups| merge), independent of the
    MV's base size; states stay integer so merge order can't drift."""
    li = table(spark, sf_dir, "lineitem")
    cut = F.lit("2000-01-01 00:00:00").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_price_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    mv = partials(li.where(F.col("l_shipdate") < cut))  # the stored view
    delta = partials(li.where(F.col("l_shipdate") >= cut))  # new arrivals
    merged = (
        mv.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("sum_price_c").alias("sum_price_c"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        (F.col("sum_price_c").cast("double") / 100.0).alias("sum_price"),
        "n_rows",
        F.round(F.col("sum_qty").cast("double") / F.col("n_rows"), 4).alias(
            "avg_qty"
        ),
    ).orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# join_fuzzy_symdelete — edit-distance-1 self-join, deletion blocking
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       a.c_name AS a_name, b.c_name AS b_name
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) = 1
ORDER BY a_key, b_key
"""


@query("join_fuzzy_symdelete", oracle=_FUZZY_ORACLE, survey_id="B-17-ext")
def join_fuzzy_symdelete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 similarity self-join via symmetric-delete
    blocking (SymSpell): each name expands to itself plus every
    single-character deletion; two strings within Levenshtein 1 are
    GUARANTEED to share a variant (delete the edited position from the
    longer/both sides), so an exact equi-join on the variant yields a
    complete candidate set and `levenshtein()==1` verifies. The oracle
    is the all-pairs definition — the blocking is proven lossless by the
    hash match, not assumed. At 100 TB this is the difference between
    O(N²) name comparisons and an index join whose left side is
    N·(len+1) short keys; naive prefix blocking would degenerate here
    (every c_name shares the 'Customer#' prefix — one bucket = all
    pairs), which is exactly why the deletion neighborhood, keyed on the
    WHOLE variant, is the scale-correct block key."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # name itself + one-char deletions, as (variant) exploded rows
    variants = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)), i ->"
                    " concat(substring(c_name, 1, i - 1),"
                    " substring(c_name, i + 1, length(c_name) - i)))"
                ),
            )
        ).alias("variant"),
    )
    a = variants.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        "variant",
    )
    b = variants.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        "variant",
    )
    # merge hint: both join inputs sit BELOW an explode, so Catalyst
    # sizes them from the 2 MB customer scan and elects a broadcast —
    # of an N·(len+1)-row exploded relation (3M rows at sf1, OOM; at
    # cluster scale it would ship the whole variant index to every
    # executor). Shuffle on the short variant key is the scale plan.
    return (
        a.join(b.hint("merge"), ["variant"])
        .where(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
        .where(F.levenshtein("a_name", "b_name") == 1)
        .orderBy("a_key", "b_key")
    )


# ---------------------------------------------------------------------------
# events_interpolate_linear — time-series interpolation
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH counts AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         COUNT(*) AS n FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM counts
),
spine AS (
  SELECT t.event_type, h.hour_start
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                AS hour_start FROM bounds) h
),
joined AS (
  SELECT s.event_type, s.hour_start, c.n,
         CAST(epoch(s.hour_start) AS BIGINT) / 3600 AS eh
  FROM spine s LEFT JOIN counts c USING (event_type, hour_start)
),
ctx AS (
  SELECT event_type, hour_start, n, eh,
         last_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY eh
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_n,
         last_value(CASE WHEN n IS NOT NULL THEN eh END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY eh
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_eh,
         first_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY eh
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_n,
         first_value(CASE WHEN n IS NOT NULL THEN eh END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY eh
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_eh
  FROM joined
)
SELECT event_type, hour_start,
       CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END AS is_observed,
       round(CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                  ELSE CAST(prev_n AS DOUBLE)
                       + CAST(next_n - prev_n AS DOUBLE)
                         * CAST(eh - prev_eh AS DOUBLE)
                         / CAST(next_eh - prev_eh AS DOUBLE)
             END, 4) AS n_filled
FROM ctx
WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
ORDER BY event_type, hour_start
"""


@query("events_interpolate_linear", oracle=_INTERP_ORACLE, survey_id="B-31-ext")
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hourly counts per event type —
    the numeric completion of ``events_gap_fill`` (which zero-fills).
    The dense spine is generated distributed (broadcast 1-row bounds ×
    distinct types, sequence+explode — no collect); prev/next observed
    neighbors come from last/first IGNORE NULLS window frames over ONE
    sort of the spine, not a self-join. Interpolation endpoints are
    exact BIGINTs (counts and epoch-hours), so the single rounded
    double is engine-stable (§5.3 rule 2). Rows outside the first/last
    observation of a series are dropped (no extrapolation). At 100 TB
    the windowed side is |types|·|hours| — spine-sized, not fact-sized:
    the fact collapses to hourly counts before any window."""
    ev = table(spark, sf_dir, "events")
    # counts feeds bounds, the type dim, and the spine join — persist
    # the |types|·|hours|-sized aggregate so the fact scans once
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n")).persist()
    bounds = counts.agg(
        F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi")
    )
    types = counts.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    joined = spine.join(counts, ["event_type", "hour_start"], "left").withColumn(
        "eh", (F.unix_timestamp("hour_start") / 3600).cast("long")
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_eh = F.when(F.col("n").isNotNull(), F.col("eh"))
    ctx = (
        joined.withColumn("prev_n", F.last("n", ignorenulls=True).over(w_back))
        .withColumn("prev_eh", F.last(obs_eh, ignorenulls=True).over(w_back))
        .withColumn("next_n", F.first("n", ignorenulls=True).over(w_fwd))
        .withColumn("next_eh", F.first(obs_eh, ignorenulls=True).over(w_fwd))
    )
    frac = (F.col("eh") - F.col("prev_eh")).cast("double") / (
        F.col("next_eh") - F.col("prev_eh")
    ).cast("double")
    filled = F.when(F.col("n").isNotNull(), F.col("n").cast("double")).otherwise(
        F.col("prev_n").cast("double")
        + (F.col("next_n") - F.col("prev_n")).cast("double") * frac
    )
    return (
        ctx.where(F.col("prev_n").isNotNull() & F.col("next_n").isNotNull())
        .select(
            "event_type",
            "hour_start",
            F.when(F.col("n").isNotNull(), 1).otherwise(0).alias("is_observed"),
            F.round(filled, 4).alias("n_filled"),
        )
        .orderBy("event_type", "hour_start")
    )


# ---------------------------------------------------------------------------
# text_encode_ids — vocabulary build + numericalization
# ---------------------------------------------------------------------------

_ENCODE_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS tok_id
  FROM toks GROUP BY tok
)
SELECT t.doc_id,
       array_to_string(list(v.tok_id ORDER BY t.pos), ',') AS ids,
       COUNT(*) AS n_tokens
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@query("text_encode_ids", oracle=_ENCODE_ORACLE, survey_id="B-59-ext")
def text_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction + document numericalization — the
    tokenize→ids step every pretrain pipeline runs before packing.
    Vocab ids are frequency-ranked (count DESC, token ASC — a total
    order, so ids are deterministic across engines and runs). The
    global row_number window runs over the VOCAB aggregate — bounded by
    |distinct tokens|, not corpus size — the same single-partition-on-
    tiny-side trade as text_tfidf's corpus constant; at open-vocab
    scale you'd shard by frequency band first. Documents re-assemble
    via sort_array over (pos, id) structs — no per-row Python, and the
    vocab side broadcasts into the token join. Output ids are a joined
    string (driver-canonicalizable, the embed_quantize_int8 lesson)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "tok_id",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("tok"))),
        )
        .select("tok", "tok_id")
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok_id"))),
                    lambda s: s["tok_id"].cast("string"),
                ),
                ",",
            ).alias("ids"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# sink_dynamic_partition_overwrite — partition-scoped replace
# ---------------------------------------------------------------------------

_DPO_ORACLE = """
SELECT event_type,
       CASE WHEN event_type IN ('click', 'error')
            THEN (SELECT COUNT(*) FROM events e2
                  WHERE e2.event_type = e.event_type AND e2.value > 2.0)
            ELSE COUNT(*) END AS n
FROM events e
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "sink_dynamic_partition_overwrite", oracle=_DPO_ORACLE, survey_id="B-5-ext"
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic): a
    second INSERT OVERWRITE replaces ONLY the partitions present in its
    input — here the rewritten click/error slices — while every other
    partition survives untouched. This is the idempotent-backfill
    primitive for partitioned lakes: reprocess one day/type without
    rewriting 100 TB. In STATIC mode the same write would have deleted
    the other three partitions; the oracle (full counts for untouched
    types, filtered counts for rewritten ones) hash-pins the dynamic
    semantics. Conf is set per-write via option(), not session-wide."""
    import os

    ev = table(spark, sf_dir, "events")
    out = os.path.join(scratch_dir("sink_dynamic_partition_overwrite", sf_dir), "events_parted")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    rewritten = ev.where(
        F.col("event_type").isin("click", "error") & (F.col("value") > 2.0)
    )
    rewritten.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("event_type").cast("string").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# sql_not_in_nulls — three-valued-logic parity
# ---------------------------------------------------------------------------

_NOTIN_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (
     SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END
     FROM orders)) AS n_not_in,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (
     SELECT 1 FROM orders o
     WHERE (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END)
           = c.c_custkey)) AS n_not_exists
"""


@query("sql_not_in_nulls", oracle=_NOTIN_ORACLE, survey_id="B-15-ext")
def sql_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NOT EXISTS null trap, pinned cross-engine: when the
    subquery result contains a NULL (here every 'P'-status order), SQL's
    three-valued logic makes `x NOT IN (...)` UNKNOWN for every x — the
    count collapses to 0 — while NOT EXISTS (null-safe per-row
    comparison) returns the true anti-set. Both engines must agree on
    BOTH counts; an engine that "fixes" NOT IN silently would fail the
    hash. Spark plans the NOT IN as a null-aware anti join — a real
    physical operator, not a rewrite to NOT EXISTS, which is why the
    semantic difference survives to the plan level."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM v_customer WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END
             FROM v_orders)) AS n_not_in,
          (SELECT COUNT(*) FROM v_customer c WHERE NOT EXISTS (
             SELECT 1 FROM v_orders o
             WHERE (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END)
                   = c.c_custkey)) AS n_not_exists
        """
    )


# ---------------------------------------------------------------------------
# agg_regression_ols — exact-sum closed-form OLS per group
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         SUM(CAST(l_quantity AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 4) AS slope,
       round((CAST(sy AS DOUBLE) / 100.0
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 4) AS intercept
FROM s
ORDER BY l_returnflag
"""


@query("agg_regression_ols", oracle=_OLS_ORACLE, survey_id="B-25-ext")
def agg_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS (price ~ quantity per return flag) from EXACT
    integer moment sums: n, Σx, Σy, Σx², Σxy all accumulate as BIGINT
    (quantity is integral, price in cents; Σxy tops out ~3·10¹³ at
    sf0.1 — far inside int64), so the partial-aggregate merge order
    cannot move a bit, and the slope/intercept are two deterministic
    double divisions at the very end (§5.3 rule 2). This is the
    map-side-combinable regression the built-in regr_slope computes in
    floating point — restated exactly. At 100 TB it is ONE hash
    aggregate; no second pass, no centering pass."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = cents("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den / 100.0
    intercept = (
        F.col("sy").cast("double") / 100.0
        - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# agg_entropy_peruser — ordered-fold Shannon entropy
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS ni
  FROM events GROUP BY user_id, event_type
),
folded AS (
  SELECT user_id,
         CAST(list_reduce(
           list_prepend(0.0, list_transform(
             list_sort(list(ni)),
             n -> CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))),
           (a, b) -> a + b) AS DOUBLE) AS sum_nlogn,
         CAST(SUM(ni) AS BIGINT) AS n, COUNT(*) AS n_types
  FROM counts GROUP BY user_id
)
SELECT user_id, n, n_types,
       round(log2(CAST(n AS DOUBLE)) - sum_nlogn / CAST(n AS DOUBLE), 4)
         AS entropy_bits
FROM folded
ORDER BY user_id
"""


@query("agg_entropy_peruser", oracle=_ENTROPY_ORACLE, survey_id="B-25-ext")
def agg_entropy_peruser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix, H = log2(n) −
    (Σ nᵢ·log2 nᵢ)/n. The float sum Σ nᵢ·log2 nᵢ is the one place
    engines could drift (addition order), so both sides fold over the
    SAME sorted list — sort_array + F.aggregate here, list_sort +
    list_reduce in DuckDB — a strict left fold in identical order,
    making the §5.3 rounding genuinely tie-free rather than
    probably-fine. Counts are exact BIGINTs; per-user lists are bounded
    by |event types| (5), so the collect is a fixed-width state, not a
    memory risk at scale."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("ni"))
    folded = counts.groupBy("user_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list("ni")),
            F.lit(0.0),
            lambda acc, n: acc + n.cast("double") * F.log2(n.cast("double")),
        ).alias("sum_nlogn"),
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return folded.select(
        "user_id",
        "n",
        "n_types",
        F.round(
            F.log2(F.col("n").cast("double"))
            - F.col("sum_nlogn") / F.col("n").cast("double"),
            4,
        ).alias("entropy_bits"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# win_streak_longest — gaps-and-islands consecutive-day streaks
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) * INTERVAL 1 DAY AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


@query("win_streak_longest", oracle=_STREAK_ORACLE, survey_id="B-28-ext")
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the canonical
    gaps-and-islands rewrite: date minus row_number is constant within
    a consecutive run, so the streak becomes a plain GROUP BY on that
    derived island key. No self-join, no recursion — two keyed
    aggregates and one window over the per-user distinct-day set
    (bounded by the calendar, not the event volume; the fact collapses
    to distinct days first). All arithmetic is integer dates."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_active_days"),
            F.max("streak_len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# join_asof_tolerance — as-of join with a max-staleness bound
# ---------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN c.last_click >= p.ts - INTERVAL 1 HOUR
            THEN c.last_click END AS click_ts,
       CASE WHEN c.last_click >= p.ts - INTERVAL 1 HOUR
            THEN 1 ELSE 0 END AS attributed
FROM events p
LEFT JOIN LATERAL (
  SELECT MAX(c.ts) AS last_click FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
) c ON TRUE
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, survey_id="B-19-ext")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a tolerance bound (attribute each purchase to
    the latest click ≤ 1 hour old) — the staleness-capped variant of
    ``join_asof``. Same single-window rewrite: carry the last click
    timestamp forward through each user's time-ordered stream (RANGE
    frame to ts, so a click sharing the purchase's exact timestamp is
    matched identically to the oracle's MAX semantics), then apply the
    tolerance as a post-filter. One shuffle on user_id; the oracle's
    correlated LATERAL rescan is exactly what this rewrite avoids at
    100 TB. Unmatched / too-stale purchases survive with NULL (left
    semantics), flagged by `attributed`."""
    ev = table(spark, sf_dir, "events")
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_last = ev.withColumn(
        "last_click", F.last(click_ts, ignorenulls=True).over(w)
    )
    fresh = F.col("last_click") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return (
        with_last.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(fresh, F.col("last_click")).alias("click_ts"),
            F.when(fresh, 1).otherwise(0).alias("attributed"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# agg_bitmap_distinct — exact distinct via bitmap OR
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH buckets AS (
  SELECT event_type, user_id // 32 AS bucket,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bits
  FROM events GROUP BY event_type, bucket
)
SELECT b.event_type,
       CAST(SUM(bit_count(b.bits)) AS BIGINT) AS n_distinct_bitmap,
       d.n_distinct_exact
FROM buckets b
JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
      FROM events GROUP BY event_type) d USING (event_type)
GROUP BY b.event_type, d.n_distinct_exact
ORDER BY b.event_type
"""


@query("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, survey_id="B-21-ext")
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via bitmap indexes — the roaring-bitmap
    pattern (ClickHouse groupBitmap, Druid): each 32-id bucket folds
    into ONE BIGINT with bit_or (associative, merge-order free), and
    distinct = Σ popcount. Map-side combine compresses each partition
    to |groups|·|buckets| longs (32 ids per long here — bit 63 would trip DuckDB's checked shift) before the shuffle — unlike
    count_distinct's expand, no raw ids cross the wire. The query emits
    BOTH counts (bitmap and the built-in) so the equivalence is itself
    hash-certified. Dense small id domains only; sparse domains want
    the HLL sketch (``agg_hll_union_sketch``) instead."""
    ev = table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", (F.col("user_id") / 32).cast("long").alias("bucket")
    ).agg(
        F.bit_or(
            # F.shiftleft only takes a literal shift; the per-row shift
            # needs the SQL form (still codegen'd JVM-side)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
        ).alias("bits")
    )
    per_type = buckets.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_distinct_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct_exact")
    )
    return (
        per_type.join(exact, "event_type")
        .select("event_type", "n_distinct_bitmap", "n_distinct_exact")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# embed_matryoshka_recall — truncated-dimension ANN certificate
# ---------------------------------------------------------------------------

_MATRYOSHKA_ORACLE = """
WITH truth AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                            CAST(a.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])))), 4)
             DESC, b.vec_id) AS rn
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id <= 9
  ) t WHERE rn <= 5
),
trunc AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             round(list_dot_product(CAST(a.embedding AS DOUBLE[])[1:16],
                                    CAST(b.embedding AS DOUBLE[])[1:16])
                   / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[])[1:16],
                                            CAST(a.embedding AS DOUBLE[])[1:16]))
                      * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[])[1:16],
                                              CAST(b.embedding AS DOUBLE[])[1:16]))), 4)
             DESC, b.vec_id) AS rn
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id <= 9
  ) t WHERE rn <= 5
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(COUNT(trunc.neighbor_id) AS BIGINT) AS n_caught,
       round(COUNT(trunc.neighbor_id) * 1.0 / COUNT(*), 4) AS recall
FROM truth LEFT JOIN trunc USING (probe_id, neighbor_id)
"""


@query("embed_matryoshka_recall", oracle=_MATRYOSHKA_ORACLE, survey_id="north-star")
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation certificate: score top-5
    retrieval using only the FIRST 16 of 64 dims against the full-dim
    truth, emit (n_truth, n_caught, recall) as a driver-hash-checked
    row (the sim_ivf_recall pattern). Truncation is the cheapest ANN
    speedup there is — 4× less I/O and FLOPs with zero index build —
    and this op measures exactly what it costs in recall. Both sides
    are deterministic SQL (round-4 + vec_id tiebreak), so DuckDB
    recomputes truth, truncated candidates, AND the overlap. At 100 TB
    the truncated pass is the cheap first stage of a rerank cascade:
    retrieve k'=5k on 16 dims, rerank the survivors on 64."""
    from cloudtrail_streamer_spark.functions.vector import as_double, dot, l2_norm

    # four subtrees read embeddings (probes+candidates × two passes);
    # persist so the table is scanned once per run of the certificate.
    # NOTE: persist a derived projection, NOT the raw table() relation —
    # Spark's cache manager substitutes a cached plan into ANY query
    # whose subtree matches it, so caching the bare scan would silently
    # rewrite every other embeddings query in the same session.
    em = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").alias("embedding"))
        .persist()
    )

    def topk(dims: int | None) -> DataFrame:
        emb = F.col("embedding") if dims is None else F.slice("embedding", 1, dims)
        probes = em.where(F.col("vec_id") <= 9).select(
            F.col("vec_id").alias("probe_id"),
            as_double(emb).alias("p_emb"),
        ).withColumn("p_norm", l2_norm(F.col("p_emb")))
        cand = em.select(
            F.col("vec_id").alias("neighbor_id"), as_double(emb).alias("c_emb")
        ).withColumn("c_norm", l2_norm(F.col("c_emb")))
        score = F.round(
            dot(F.col("p_emb"), F.col("c_emb"))
            / (F.col("p_norm") * F.col("c_norm")),
            4,
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("score").desc(), "neighbor_id"
        )
        return (
            cand.join(F.broadcast(probes), F.col("probe_id") != F.col("neighbor_id"))
            .withColumn("score", score)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5)
            .select("probe_id", "neighbor_id")
        )

    truth = topk(None)
    trunc = topk(16).withColumn("caught", F.lit(1))
    j = truth.join(trunc, ["probe_id", "neighbor_id"], "left")
    n_caught = F.sum(F.coalesce("caught", F.lit(0)))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        n_caught.cast("long").alias("n_caught"),
        F.round(n_caught / F.count(F.lit(1)), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — co-activity triangle counting
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h FROM events
),
edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM active a JOIN active b ON a.h = b.h AND a.user_id < b.user_id
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM active) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM tri
"""


@query("graph_triangle_count", oracle=_TRIANGLE_ORACLE, survey_id="north-star")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the user co-activity graph
    (edge = two users active in the same MINUTE — co-presence tight
    enough that the graph stays sparse; hour-level co-activity makes
    this fixture a near-clique by sf0.1, 1.1 M edges over 1500 users,
    and no triangle algorithm survives a clique: the count itself is
    C(n,3) and the r4 cross-scale drive OOM'd exactly there. Granularity
    is part of the graph DEFINITION, not a perf knob: co-presence
    windows must be chosen so |edges| grows ~linearly with activity,
    the same judgment call every production co-occurrence graph makes).
    The classic scale
    pattern: ORIENT each edge from the (degree, id)-smaller endpoint to
    the larger, so every triangle is counted exactly once as a wedge
    a→b, a→c closed by b→c — and the wedge fan-out is bounded by the
    max ORIENTED out-degree (≤√|E|-ish), not the max raw degree. The
    skewed-hub problem that kills naive wedge counting at 100 TB
    disappears before the first join. Edge extraction collapses the
    fact to distinct (user, hour) first; the wedge joins run on the
    edge list alone. The oracle counts the same triangles as ordered
    triples u<v<w — orientation-independent, so the hash check proves
    the oriented algorithm loses/duplicates nothing."""
    ev = table(spark, sf_dir, "events")
    # every shared node below is persisted: Catalyst re-expands each
    # DataFrame reference into a fresh subtree, so without the caches
    # this query compounds to 43 scans of the fact (edges→deg→oriented→
    # wedges/closer multiply out). With them: one fact scan, and the
    # cached relations are (node,hour) / edge-list sized — tiny next to
    # the fact at 100 TB. Same pattern GraphFrames uses.
    active = (
        ev.select("user_id", F.date_trunc("minute", F.col("ts")).alias("h"))
        .distinct()
        .persist()
    )
    a = active.select(F.col("user_id").alias("u"), "h")
    b = active.select(F.col("user_id").alias("v"), "h")
    edges = (
        a.join(b, "h")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .persist()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # orient from (deg, id)-smaller to larger: src has fewer wedges
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .persist()
    )
    w1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    w2 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") != F.col("c"))
    # close the wedge with an oriented edge in EITHER direction b↔c
    closer = oriented.select(
        F.col("s").alias("b"), F.col("t").alias("c")
    ).unionAll(oriented.select(F.col("t").alias("b"), F.col("s").alias("c")))
    tri = wedges.join(closer, ["b", "c"]).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_triangles")
    )
    n_nodes = active.agg(F.count_distinct("user_id").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


# ---------------------------------------------------------------------------
# dq_constraint_suite — Deequ-style data-quality gate
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT * FROM (
  SELECT 'events_props_json_shape' AS check_name,
         -- json_extract_string, not json_extract: the latter returns the
         -- non-NULL JSON 'null' value for {"k": null} while Spark's
         -- get_json_object returns SQL NULL — the text-typed extraction
         -- maps JSON null -> SQL NULL on both engines (ADVICE r03)
         (SELECT COUNT(*) FROM events
          WHERE json_extract_string(props, '$.k') IS NULL) AS n_violations
  UNION ALL
  SELECT 'lineitem_qty_range',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_quantity < 1 OR l_quantity > 50)
  UNION ALL
  SELECT 'orders_fk_customer',
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'orders_pk_unique',
         (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'part_price_positive',
         (SELECT COUNT(*) FROM part WHERE p_retailprice <= 0)
) checks
ORDER BY check_name
"""


@query("dq_constraint_suite", oracle=_DQ_ORACLE, survey_id="B-8-ext")
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ pattern): declarative
    expectations — key uniqueness, referential integrity, value
    domains, semi-structured shape — each evaluated as a violation
    COUNT and unioned into one certificate relation. Counting
    violations (not filtering them) means a green run is a positive
    assertion the driver hash-checks, and a future bad feed flips a
    number, not a row set. Each check is an independent aggregate;
    Spark runs them as parallel jobs over pruned column subsets, and
    the FK check is a left-anti count, not a correlated rescan. This is
    the batch half of the reliability story whose streaming half is
    source_corrupt_records' quarantine."""
    ev = table(spark, sf_dir, "events")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "events_props_json_shape",
            ev.agg(
                F.sum(
                    F.when(
                        F.get_json_object("props", "$.k").isNull(), 1
                    ).otherwise(0)
                ).alias("n_violations")
            ),
        ),
        one(
            "lineitem_qty_range",
            li.agg(
                F.sum(
                    F.when(
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                    ).otherwise(0)
                ).alias("n_violations")
            ),
        ),
        one(
            "orders_fk_customer",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
                F.count(F.lit(1)).alias("n_violations")
            ),
        ),
        one(
            "orders_pk_unique",
            o.agg(
                (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
                    "n_violations"
                )
            ),
        ),
        one(
            "part_price_positive",
            p.agg(
                F.sum(F.when(F.col("p_retailprice") <= 0, 1).otherwise(0)).alias(
                    "n_violations"
                )
            ),
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# agg_moments_exact — higher moments from exact power sums
# ---------------------------------------------------------------------------

_MOMENTS_ORACLE = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS s1,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS s3,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
  FROM lineitem GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS m2,
         CAST(s3 AS DOUBLE) / n AS m3,
         CAST(s4 AS DOUBLE) / n AS m4
  FROM s
)
SELECT l_returnflag, n,
       round(m1, 4) AS mean,
       round(m2 - m1 * m1, 4) AS var_pop,
       round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
             / pow(m2 - m1 * m1, 1.5), 4) AS skewness,
       round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
             / pow(m2 - m1 * m1, 2) - 3, 4) AS kurtosis_excess
FROM m
ORDER BY l_returnflag
"""


@query("agg_moments_exact", oracle=_MOMENTS_ORACLE, survey_id="B-25-ext")
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/skewness/kurtosis from EXACT integer power sums
    (Σx..Σx⁴ as BIGINT — x ≤ 50 keeps Σx⁴ < 4·10¹² at sf0.1), then the
    raw-moment formulas in doubles at the very end. The built-in
    skewness()/kurtosis() accumulate floating central moments whose
    partial-merge order wobbles the low bits; power sums are
    merge-order-free, so this version is reproducible to the bit
    across engines, partitionings, AND reruns — the property that
    matters when a 100 TB job retries a stage. One hash aggregate,
    identical formula text in the oracle (§5.3 rule 5)."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    m3 = F.col("s3").cast("double") / nd
    m4 = F.col("s4").cast("double") / nd
    var = m2 - m1 * m1
    return s.select(
        "l_returnflag",
        "n",
        F.round(m1, 4).alias("mean"),
        F.round(var, 4).alias("var_pop"),
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5), 4).alias(
            "skewness"
        ),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
            / F.pow(var, 2)
            - 3,
            4,
        ).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# fn_timezone_convert — cross-engine timezone arithmetic parity
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT date_trunc('day', ts) AS day_utc,
       hour(timezone('America/New_York', timezone('UTC', ts))) AS hour_ny,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY day_utc, hour_ny
"""


@query("fn_timezone_convert", oracle=_TZ_ORACLE, survey_id="B-39-ext")
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion parity: events (stored tz-naive UTC per
    FIXTURES.md) bucketed by their America/New_York local hour —
    Spark's from_utc_timestamp against DuckDB's two-step timezone()
    (both ICU-backed IANA lookups, session-timezone independent by
    construction; the UTC session conf guards the rest of the engine
    but this op must be correct even without it). January dates sit
    safely on EST (UTC-5), so the check pins the conversion machinery
    rather than a DST edge; the local-hour histogram shape (hours
    19-23 spilling into the previous UTC day) is the regression
    canary. Row-local codegen — no shuffle beyond the final count."""
    ev = table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp(F.col("ts"), "America/New_York")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day_utc"),
            F.hour(ny).alias("hour_ny"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day_utc", "hour_ny")
    )


# ---------------------------------------------------------------------------
# dedup_semantic_ivf — SemDeDup-style cluster-scoped near-dup pairs
# ---------------------------------------------------------------------------

_SEMANTIC_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent AS (
  SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 16
),
assign AS (
  SELECT vec_id, centroid_id AS cell, e FROM (
    SELECT v.vec_id, cent.centroid_id, v.e,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             round(list_reduce(
               list_prepend(0.0, list_transform(range(1, 65),
                 i -> (v.e[i] - cent.ce[i]) * (v.e[i] - cent.ce[i]))),
               (a, b) -> a + b), 6),
             cent.centroid_id) AS rn
    FROM v CROSS JOIN cent
  ) t WHERE rn = 1
)
SELECT a.cell AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))), 4) AS score
FROM assign a JOIN assign b
  ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 4) >= 0.35
ORDER BY cell, id_a, id_b
"""


@query("dedup_semantic_ivf", oracle=_SEMANTIC_ORACLE, survey_id="north-star")
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-duplicate detection: assign every
    embedding to its nearest IVF centroid (the embed_ivf_assign
    kernel), then search cosine ≥ τ pairs ONLY within each cell (τ=0.35 here —
    the fixtures' random embeddings are near-orthogonal, max intra-cell
    cosine ≈0.49, so τ sits at the ~99th percentile of pair scores;
    real near-dup corpora would use τ≈0.9 with the same plan) —
    an equi-join on the cell key, cutting candidate pairs by ~|cells|
    versus all-pairs. This caps the dedup family: exact (md5), MinHash,
    SimHash, winnowing, and now embedding-space semantic — each with a
    bucketed candidate structure. The oracle recomputes assignment AND
    intra-cell pairs, so the cluster-scoping is hash-verified, not
    assumed. Assignment distances round to 1e-6 with centroid tiebreak
    (§5.3); at 100 TB the assign step is a k-row broadcast and the pair
    step shuffles on cell — never the O(N²) matrix."""
    from cloudtrail_streamer_spark.functions.vector import as_double, dot, l2_norm

    em = table(spark, sf_dir, "embeddings")
    v = em.select("vec_id", as_double(F.col("embedding")).alias("e"))
    cent = v.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    dist2 = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(F.col("dist2"), 6), "centroid_id"
    )
    assign = (
        v.join(F.broadcast(cent))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"), "e")
        .persist()  # both pair-join sides; recompute = broadcast join + window
    )
    a = assign.select(
        F.col("cell"), F.col("vec_id").alias("id_a"), F.col("e").alias("ea")
    )
    b = assign.select(
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
    )
    score = F.round(
        dot(F.col("ea"), F.col("eb"))
        / (l2_norm(F.col("ea")) * l2_norm(F.col("eb"))),
        4,
    )
    return (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("score", score)
        .where(F.col("score") >= 0.35)
        .select("cell", "id_a", "id_b", "score")
        .orderBy("cell", "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# agg_gini_coefficient — exact rank-weighted inequality metric
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev_c,
         row_number() OVER (ORDER BY rev_c, o_custkey) AS i
  FROM per_cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       round((2.0 * CAST(SUM(i * rev_c) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev_c) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE),
             4) AS gini
FROM ranked
"""


@query("agg_gini_coefficient", oracle=_GINI_ORACLE, survey_id="B-25-ext")
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the rank-weighted formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending revenue with a custkey total-order tiebreak (§5.3 rule
    3, so equal revenues rank identically in both engines; the i·xᵢ
    SUM is tie-invariant within equal x anyway). Everything left of
    the final two divisions is BIGINT-exact (i·xᵢ ≤ 10¹² at sf0.1).
    The global rank runs over the PER-CUSTOMER aggregate — |customers|
    rows, not |orders| — which is what makes a single-partition window
    acceptable; at true scale swap in a binned Lorenz approximation."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("rev_c")
    )
    ranked = per_cust.withColumn(
        "i", F.row_number().over(Window.orderBy("rev_c", "o_custkey")).cast("long")
    )
    n = F.count(F.lit(1)).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("rev_c")).cast("double"))
            / (n * F.sum("rev_c").cast("double"))
            - (n + 1.0) / n,
            4,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# win_running_distinct — running distinct count via first-occurrence flags
# ---------------------------------------------------------------------------

_RUNNING_DISTINCT_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
         THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, ts,
       CAST(SUM(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_types_so_far
FROM flagged
ORDER BY user_id, ts, event_id
"""


@query("win_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE, survey_id="B-30-ext")
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — not directly supported
    by any engine's window frames — rewritten as first-occurrence flags
    (row_number = 1 per (user, type)) summed cumulatively. Two window
    passes over the same user_id partitioning, so Catalyst reuses ONE
    shuffle for both (adjacent Window nodes, same partition keys). The
    state per row is a flag, not a distinct-set — the rewrite that
    keeps running-distinct O(1) memory per row at 100 TB where a naive
    per-frame set would be O(frame)."""
    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return (
        flagged.select(
            "event_id",
            "user_id",
            "ts",
            F.sum("first_seen").over(w_run).cast("long").alias("n_types_so_far"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# win_percent_change_yoy — year-over-year growth via lag
# ---------------------------------------------------------------------------

_YOY_ORACLE = """
WITH monthly AS (
  SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1, 2
)
SELECT o_year, o_month,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       round((CAST(rev_c AS DOUBLE)
              - CAST(lag(rev_c) OVER (PARTITION BY o_month ORDER BY o_year)
                     AS DOUBLE))
             * 100.0
             / CAST(lag(rev_c) OVER (PARTITION BY o_month ORDER BY o_year)
                    AS DOUBLE), 4) AS yoy_pct
FROM monthly
ORDER BY o_year, o_month
"""


@query("win_percent_change_yoy", oracle=_YOY_ORACLE, survey_id="B-29-ext")
def win_percent_change_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — LAG partitioned by
    calendar month, ordered by year (the BI staple). The fact collapses
    to |years|·12 rows before the window; revenue stays integer cents
    through the lag so the growth ratio is ONE double division, and the
    first year's NULL lag propagates to a NULL yoy_pct identically in
    both engines."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    w = Window.partitionBy("o_month").orderBy("o_year")
    prev = F.lag("rev_c").over(w)
    return (
        monthly.select(
            "o_year",
            "o_month",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            F.round(
                (F.col("rev_c").cast("double") - prev.cast("double"))
                * 100.0
                / prev.cast("double"),
                4,
            ).alias("yoy_pct"),
        )
        .orderBy("o_year", "o_month")
    )


# ---------------------------------------------------------------------------
# text_pmi_bigrams — pointwise mutual information of adjacent tokens
# ---------------------------------------------------------------------------

_PMI_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
),
bigrams AS (
  SELECT tok AS w1, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bigrams
  WHERE w2 IS NOT NULL GROUP BY w1, w2
),
uni AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
tot AS (
  SELECT SUM(c12) AS n FROM bg
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       round(log2(CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
FROM bg, tot
JOIN uni u1 ON u1.tok = bg.w1
JOIN uni u2 ON u2.tok = bg.w2
WHERE c12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 50
"""


@query("text_pmi_bigrams", oracle=_PMI_ORACLE, survey_id="B-60-ext")
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation-mining primitive (phrase detection before tokenizer
    training). PMI = log2(c(a,b)·N / (c(a)·c(b))): every count is an
    exact BIGINT from two keyed aggregates (bigrams via LEAD over one
    posexplode pass — no self-join), N broadcasts as a 1-row aggregate,
    and the single log2 is deterministic per row (no float summation
    anywhere, §5.3). The c12 ≥ 5 support floor is the standard
    sparse-collocation cut that also bounds the output at scale;
    top-50 is total-ordered."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    # bg feeds the N total + the main select, uni feeds both unigram
    # sides — persist the two keyed aggregates (vocab-sized) so the
    # corpus is tokenized once per aggregate, not once per reference
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    tot = bg.agg(F.sum("c12").alias("n"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bg.where(F.col("c12") >= 5)
        .join(F.broadcast(tot))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log2(
                    F.col("c12").cast("double")
                    * F.col("n").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# events_cusum_changepoint — CUSUM drift detection on daily error rates
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d,
         COUNT(*) FILTER (event_type = 'error') AS n_err,
         COUNT(*) AS n
  FROM events GROUP BY 1
),
tot AS (
  SELECT SUM(n_err) AS te, SUM(n) AS tn FROM daily
),
walk AS (
  SELECT d, n_err, n,
         SUM(CAST(n_err AS DOUBLE)
             - CAST(n AS DOUBLE) * CAST(te AS DOUBLE) / CAST(tn AS DOUBLE))
           OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily, tot
)
SELECT d AS change_day, round(cusum, 4) AS cusum_peak,
       CAST(n_err AS BIGINT) AS n_err_that_day
FROM walk
ORDER BY abs(round(cusum, 4)) DESC, d
LIMIT 1
"""


@query("events_cusum_changepoint", oracle=_CUSUM_ORACLE, survey_id="B-31-ext")
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily error rate: the
    cumulative sum of (observed − expected) errors peaks (in absolute
    value) at the most likely rate-shift day — the standard
    drift-detection statistic, and the batch analog of a streaming
    monitor. The fact collapses to |days| rows before the one global
    prefix-sum window (calendar-bounded, same trade as
    events_interpolate_linear); expected rates come from a broadcast
    1-row total. Counts are exact; each cusum value is a prefix fold
    in d-order on BOTH engines — same addition order, so round(4)
    is safe — and the argmax is total-ordered by (|round(cusum,4)| desc,
    d), the rounding applied symmetrically on BOTH engines (ADVICE r03:
    an asymmetric round can pick a different argmax on 4dp ties)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_err"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    tot = daily.agg(F.sum("n_err").alias("te"), F.sum("n").alias("tn"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = F.col("n_err").cast("double") - F.col("n").cast("double") * F.col(
        "te"
    ).cast("double") / F.col("tn").cast("double")
    walk = daily.join(F.broadcast(tot)).withColumn("cusum", F.sum(dev).over(w))
    return (
        walk.select(
            F.col("d").alias("change_day"),
            F.round("cusum", 4).alias("cusum_peak"),
            F.col("n_err").cast("long").alias("n_err_that_day"),
        )
        .orderBy(F.abs(F.col("cusum_peak")).desc(), "change_day")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# sql_distinct_on_first — first-row-per-key parity
# ---------------------------------------------------------------------------

_DISTINCT_ON_ORACLE = """
SELECT DISTINCT ON (user_id) user_id, event_id, ts, event_type
FROM events
ORDER BY user_id, ts, event_id
"""


@query("sql_distinct_on_first", oracle=_DISTINCT_ON_ORACLE, survey_id="B-32-ext")
def sql_distinct_on_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-row-per-key: DuckDB/Postgres spell it DISTINCT ON +
    ORDER BY; Spark has no DISTINCT ON, and the correct translation is
    row_number()=1 over the same (key, order) — NOT dropDuplicates(),
    whose kept row is whichever partition wins the hash-agg race. The
    hash check pins that the translation (with the event_id tiebreak
    both engines share) is exact. Plans as one WindowGroupLimit-able
    pass; the same shape backs `top_n_per_group` with n=1."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# win_skyline_pareto — Pareto frontier via prefix-max window
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT DISTINCT CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
         p_size
  FROM part
)
SELECT price_c, p_size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
    AND (q.price_c < p.price_c OR q.p_size > p.p_size)
)
ORDER BY price_c, p_size
"""


@query("win_skyline_pareto", oracle=_SKYLINE_ORACLE, survey_id="B-32-ext")
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): parts where no other part is both
    cheaper-or-equal AND larger-or-equal (strict in one). The oracle is
    the O(N²) NOT-EXISTS definition; the engine rewrite is ONE sorted
    window pass — a point survives iff its size beats the running MAX
    size over all STRICTLY cheaper points (RANGE frame to price−1, so
    equal prices never dominate each other through the frame) and it is
    the size-argmax within its own price tier. O(N log N) vs O(N²) is
    the difference between a window shuffle and an impossible self-join
    at 100 TB. Points are deduped to (price, size) first; integer
    cents keep the RANGE offset exact."""
    p = table(spark, sf_dir, "part")
    pts = p.select(
        cents("p_retailprice").alias("price_c"), "p_size"
    ).distinct()
    w_prev = (
        Window.orderBy("price_c").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tier = Window.partitionBy("price_c")
    return (
        pts.withColumn("max_cheaper", F.max("p_size").over(w_prev))
        .withColumn("tier_max", F.max("p_size").over(w_tier))
        .where(
            (F.col("p_size") > F.coalesce(F.col("max_cheaper"), F.lit(-1)))
            & (F.col("p_size") == F.col("tier_max"))
        )
        .select("price_c", "p_size")
        .orderBy("price_c", "p_size")
    )


# ---------------------------------------------------------------------------
# pipeline_retrieve_rerank — BM25 retrieve → embedding rerank cascade
# ---------------------------------------------------------------------------

_RERANK_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
doclen AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM doclen
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS f
  FROM toks WHERE term IN ('hash', 'join') GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS nq FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((n_docs - nq + 0.5) / (nq + 0.5) + 1.0)
           * (CAST(f AS DOUBLE) * 2.2)
           / (CAST(f AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ) AS bm25
  FROM tf JOIN df USING (term) JOIN doclen USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
shortlist AS (
  SELECT doc_id, round(bm25, 4) AS bm25 FROM scored
  ORDER BY round(bm25, 4) DESC, doc_id LIMIT 20
),
q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
  FROM embeddings WHERE vec_id = 0
)
SELECT s.doc_id, s.bm25,
       round(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe)
             / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cos_score
FROM shortlist s
JOIN embeddings e ON e.vec_id = s.doc_id
CROSS JOIN q
ORDER BY cos_score DESC, doc_id
LIMIT 5
"""


@query("pipeline_retrieve_rerank", oracle=_RERANK_ORACLE, survey_id="north-star")
def pipeline_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval cascade — the RAG-serving shape: a cheap
    lexical stage (BM25, k1=1.2, b=0.75, query "hash join") shortlists
    20 docs, then an embedding cosine rerank (doc_id-aligned vectors
    from the embeddings table, query vector = vec_id 0) picks the final
    5. The cascade is the scale story itself: stage 1 touches only the
    inverted postings of 2 terms; stage 2 scores exactly 20 vectors —
    the expensive model never sees the corpus. Both stage boundaries
    are total-ordered on ROUNDED scores (+doc_id), so the shortlist
    set — not just the final ranking — is identical cross-engine; BM25
    per-doc sums fold over ≤2 terms via the same join order. The float
    ln/cos arithmetic mirrors text_bm25_topk / sim_search_topk."""
    d = table(spark, sf_dir, "documents")
    em = table(spark, sf_dir, "embeddings")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    # doclen/tf each feed two subtrees; persisted (both are tiny keyed
    # aggregates) so the corpus is tokenized twice — once per aggregate —
    # instead of four times via subtree re-expansion. The exploded token
    # relation itself is deliberately NOT cached: it is corpus×tokens
    # sized, and the second pass prunes to 2 terms right after explode.
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")).persist()
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin("hash", "join"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist()
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("nq"))
    idf = F.log(
        (F.col("n_docs") - F.col("nq") + 0.5) / (F.col("nq") + 0.5) + 1.0
    )
    fd = F.col("f").cast("double")
    bm25_term = idf * (fd * 2.2) / (
        fd + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(bm25_term), 4).alias("bm25"))
    )
    shortlist = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(20)
    from cloudtrail_streamer_spark.functions.vector import as_double, dot, l2_norm

    qv = em.where(F.col("vec_id") == 0).select(
        as_double(F.col("embedding")).alias("qe")
    )
    cand = em.select(F.col("vec_id").alias("doc_id"), as_double("embedding").alias("de"))
    cos = F.round(
        dot(F.col("de"), F.col("qe")) / (l2_norm(F.col("de")) * l2_norm(F.col("qe"))),
        4,
    )
    return (
        shortlist.join(cand, "doc_id")
        .join(F.broadcast(qv))
        .withColumn("cos_score", cos)
        .select("doc_id", "bm25", "cos_score")
        .orderBy(F.col("cos_score").desc(), "doc_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# feature_pit_join — leakage-free point-in-time feature engineering
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(COUNT(*) OVER prior_w AS BIGINT) AS n_prior_orders,
       CAST(COALESCE(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     OVER prior_w, 0) AS DOUBLE) / 100.0 AS prior_spend
FROM orders
WINDOW prior_w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
ORDER BY o_orderkey
"""


@query("feature_pit_join", oracle=_PIT_ORACLE, survey_id="B-30-ext")
def feature_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature computation — the feature-store contract
    for training data: each order sees ONLY its customer's STRICTLY
    PRIOR history (1 PRECEDING frame end, ordered by date + orderkey),
    never its own row or the future — the window form of leakage-free
    PIT-correctness. One shuffle on the entity key produces every
    prior-history feature in a single pass; the as-of-join formulation
    of the same thing (join features table at each label timestamp) is
    what ``join_dim_snapshot_asof`` covers — this is the
    self-referential variant every churn/LTV training set needs.
    Spend stays integer cents through the frame sum."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.count(F.lit(1)).over(w).cast("long").alias("n_prior_orders"),
            (
                F.coalesce(F.sum(cents("o_totalprice")).over(w), F.lit(0)).cast(
                    "double"
                )
                / 100.0
            ).alias("prior_spend"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# scan_nested_pushdown — nested-struct parquet round trip with pruning
# ---------------------------------------------------------------------------

_NESTED_SCAN_ORACLE = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
WHERE user_id % 3 = 0
GROUP BY event_type
ORDER BY event_type
"""


@query("scan_nested_pushdown", oracle=_NESTED_SCAN_ORACLE, survey_id="B-2-ext")
def scan_nested_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-column pruning + pushdown on REAL nested parquet: events
    are rewritten as struct columns (meta.user_id, meta.event_type,
    payload.value, payload.props), then read back filtering and
    projecting ONLY meta subfields. With
    spark.sql.optimizer.nestedSchemaPruning.enabled (default on), the
    re-scan's ReadSchema carries just meta<user_id,event_type> — the
    payload struct (the bulky half at 100 TB: blobs, props) never
    leaves the parquet footprint, asserted in tests/test_plans.py. The
    oracle states the same result over the flat source, pinning that
    nesting is a pure layout change, not a semantic one."""
    import os

    ev = table(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.struct("user_id", "event_type").alias("meta"),
        F.struct("ts", "value", "props").alias("payload"),
    )
    out = os.path.join(scratch_dir("scan_nested_pushdown", sf_dir), "events_nested")
    nested.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.where(F.col("meta.user_id") % 3 == 0)
        .groupBy(F.col("meta.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta.user_id").cast("long").alias("sum_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# text_compression_quality — zlib-ratio quality heuristic (Arrow UDF)
# ---------------------------------------------------------------------------


_ZQUALITY_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_mono_violations,
       CAST(0 AS BIGINT) AS n_bounds_violations,
       TRUE AS x4_improves_avg
FROM documents
GROUP BY source
ORDER BY source
"""


@query("text_compression_quality", oracle=_ZQUALITY_ORACLE, survey_id="B-62-ext")
def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (the Gopher-rules heuristic:
    highly compressible text ≈ repetitive/low-quality). zlib runs
    inside an Arrow-batched pandas UDF — the declared slow-path escape
    hatch (B-52 pattern), batched so the codec cost amortizes per
    RecordBatch, never per-row Python.

    Tier H via a realized-invariant certificate (upgraded r10 from the
    r5-era rows-only check with the same pattern that retired
    agg_approx, VERDICT r09 #5): raw zlib ratios are codec-version
    specific, so the hashed columns are per-source COUNTS OF INVARIANT
    VIOLATIONS the oracle pins to zero — (a) monotonicity: for every
    non-empty doc the SAME codec on the text repeated 4x must compress
    strictly better (zr4 < zr); (b) bounds: every ratio must land in
    (0, length-derived deflate worst-case cap] (ADVICE r10 #3 replaced
    the flat 1.5, which sub-20-byte docs can legitimately exceed); plus the per-source
    exact doc count and the aggregate flag avg(zr4) < avg(zr). A codec
    swap, plumbing bug, or Arrow-batch corruption shows up as a nonzero
    violation count in the driver's hash compare, not just in an
    engine-local pytest. Callers who want the raw per-source ratio
    aggregates use compression_ratio_stats() below (same scored
    relation, codec-valued columns). Row-local -> zero shuffle before
    the 1-row-per-source aggregate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(one)

    @pandas_udf("double")
    def zratio_x4(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = (t * 4).encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(one)

    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.length("text").alias("n_len"),
        zratio(F.col("text")).alias("zr"),
        zratio_x4(F.col("text")).alias("zr4"),
    )
    mono_bad = (F.col("zr4") >= F.col("zr")) & (F.col("n_len") > 0)
    # Length-derived expansion cap (ADVICE r10 #3): the old flat 1.5
    # bound is wrong for very short docs (zlib's 2-byte header + 4-byte
    # adler + stored-block framing legitimately push a <20-byte text
    # past 1.5x) and needlessly loose for long ones. Deflate guarantees
    # compressed <= raw + 5*ceil(raw/65535) + 6 (stored-block fallback),
    # so ratio <= 1 + 5/65535 + 11/raw_bytes <= 1.0002 + 11/n_len
    # (n_len is CHARS <= UTF-8 bytes, so the char-based cap only
    # loosens; 0.0002 also absorbs the round(.,4) half-ulp). The x4
    # text has 4x the bytes, so its cap tightens to 11/(4*n_len).
    # Empty docs are pinned to the UDF's defined ratio of exactly 1.0.
    cap = F.lit(1.0002) + F.lit(11.0) / F.col("n_len")
    cap4 = F.lit(1.0002) + F.lit(11.0) / (F.lit(4.0) * F.col("n_len"))
    bounds_bad = F.when(
        F.col("n_len") > 0,
        (F.col("zr") <= 0)
        | (F.col("zr") > cap)
        | (F.col("zr4") <= 0)
        | (F.col("zr4") > cap4),
    ).otherwise((F.col("zr") != 1.0) | (F.col("zr4") != 1.0))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(mono_bad.cast("long")).alias("n_mono_violations"),
            F.sum(bounds_bad.cast("long")).alias("n_bounds_violations"),
            (F.avg("zr4") < F.avg("zr")).alias("x4_improves_avg"),
        )
        .orderBy("source")
    )


def compression_ratio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec-valued per-source aggregates (avg/min ratio, Gopher
    flag count at ratio < 0.45) the pre-r10 R-tier row used to return —
    kept for callers; the registered query returns the oracle-checkable
    certificate instead."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(one)

    sc = d.select("source", zratio(F.col("text")).alias("zr"))
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("zr"), 4).alias("avg_ratio"),
        F.round(F.min("zr"), 4).alias("min_ratio"),
        F.sum(F.when(F.col("zr") < 0.45, 1).otherwise(0)).alias("n_flagged_repetitive"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# pipeline_dataset_card — one-query dataset summary certificate
# ---------------------------------------------------------------------------

_CARD_ORACLE = """
WITH base AS (
  SELECT doc_id, source, lang, n_chars,
         md5(text) AS h,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
       round(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 4) AS dup_ratio,
       round(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
       round(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS pct_long
FROM base
"""


@query("pipeline_dataset_card", oracle=_CARD_ORACLE, survey_id="north-star")
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics in ONE query — the summary block every
    published pretrain corpus ships (docs, tokens, language/source
    spread, exact-dup ratio via md5, length profile). All distincts run
    in one multi-distinct aggregate pass (Catalyst expands them over a
    single scan); md5 shuffles 16-byte digests, never documents
    (dedup_exact's trick). avg_chars divides an exact integer sum. At
    100 TB this is the cheapest full-corpus health check there is —
    one scan, a few counters — and it is the op you run FIRST before
    any training job."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
    )
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.count_distinct("h").cast("long").alias("n_unique_texts"),
        F.round(1.0 - F.count_distinct("h") / F.count(F.lit(1)), 4).alias(
            "dup_ratio"
        ),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.round(
            F.sum(F.when(F.col("n_chars") >= 200, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("pct_long"),
    )


# ---------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time match, either direction
# ---------------------------------------------------------------------------

_ASOF_NEAREST_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS nearest_click_ts,
       CAST(abs(epoch_us(c.ts) - epoch_us(p.ts)) AS BIGINT) AS diff_us
FROM events p
LEFT JOIN LATERAL (
  SELECT c.ts FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click'
  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts, c.event_id
  LIMIT 1
) c ON TRUE
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@query("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE, survey_id="B-19-ext")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of: each purchase matched to the NEAREST click
    in time, past or future, ties to the earlier one — the sensor-
    alignment variant of as-of (backward-only is join_asof, staleness-
    capped is join_asof_tolerance). Rewrite: carry the last click
    backward AND the first click forward over the same user-ordered
    stream (two frames of ONE window sort), then pick the closer
    neighbor — versus the oracle's per-row LATERAL rescan. Distances
    compare in exact epoch MICROseconds (unix_micros / epoch_us —
    second-level truncation diverges from DuckDB's fractional epoch); the tie rule (≤ keeps the earlier/
    backward neighbor) is explicit in both engines. One shuffle."""
    ev = table(spark, sf_dir, "events")
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = ev.withColumn(
        "prev_c", F.last(click_ts, ignorenulls=True).over(w_back)
    ).withColumn("next_c", F.first(click_ts, ignorenulls=True).over(w_fwd))
    dp = F.unix_micros("ts") - F.unix_micros("prev_c")
    dn = F.unix_micros("next_c") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_c").isNull(), F.col("next_c"))
        .when(F.col("next_c").isNull(), F.col("prev_c"))
        .when(dp <= dn, F.col("prev_c"))
        .otherwise(F.col("next_c"))
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .withColumn("nearest_click_ts", nearest)
        .select(
            "event_id",
            "user_id",
            "ts",
            "nearest_click_ts",
            F.abs(F.unix_micros("nearest_click_ts") - F.unix_micros("ts"))
            .cast("long")
            .alias("diff_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# agg_sample_estimate_ci — approximate query processing certificate
# ---------------------------------------------------------------------------

_AQP_ORACLE = """
WITH tagged AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         ((l_orderkey & 2147483647) * 2654435761) % 100 < 10 AS in_sample
  FROM lineitem
)
SELECT CAST(COUNT(*) FILTER (in_sample) AS BIGINT) AS n_sampled,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(price_c) FILTER (in_sample) * 10 AS DOUBLE) / 100.0
         AS est_total,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 AS true_total,
       round(abs(CAST(SUM(price_c) FILTER (in_sample) * 10 AS DOUBLE)
                 - CAST(SUM(price_c) AS DOUBLE))
             * 100.0 / CAST(SUM(price_c) AS DOUBLE), 4) AS rel_error_pct
FROM tagged
"""


@query("agg_sample_estimate_ci", oracle=_AQP_ORACLE, survey_id="B-27-ext")
def agg_sample_estimate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing certificate (the BlinkDB idea): a
    deterministic 10% Knuth-hash sample estimates total revenue, and
    the SAME query carries the exact total and realized relative error
    — so the driver hash-checks the estimator, its inputs, AND its
    accuracy in one row. The hash sample (sample_hash_mod's masked
    multiplicative hash) is engine-portable and repartition-stable
    where TABLESAMPLE streams are not; sums stay integer cents. At
    100 TB the sample scan is the only thing a latency-bound dashboard
    runs — this op is the audit that says how wrong that is."""
    li = table(spark, sf_dir, "lineitem")
    in_sample = (
        F.col("l_orderkey").bitwiseAND(F.lit(2147483647)) * F.lit(2654435761)
    ) % 100 < 10
    tagged = li.select(
        cents("l_extendedprice").alias("price_c"), in_sample.alias("in_sample")
    )
    samp_sum = F.sum(F.when(F.col("in_sample"), F.col("price_c")).otherwise(0))
    true_sum = F.sum("price_c")
    return tagged.agg(
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        (samp_sum * 10).cast("double").alias("est_total_c"),
        true_sum.cast("double").alias("true_total_c"),
    ).select(
        "n_sampled",
        "n_total",
        (F.col("est_total_c") / 100.0).alias("est_total"),
        (F.col("true_total_c") / 100.0).alias("true_total"),
        F.round(
            F.abs(F.col("est_total_c") - F.col("true_total_c"))
            * 100.0
            / F.col("true_total_c"),
            4,
        ).alias("rel_error_pct"),
    )


# ---------------------------------------------------------------------------
# udaf_pandas_grouped_agg — Series→scalar pandas aggregation UDF
# ---------------------------------------------------------------------------

_GROUPED_AGG_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0, 4) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("udaf_pandas_grouped_agg", oracle=_GROUPED_AGG_ORACLE, survey_id="B-53-ext")
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third pandas-UDF shape: GROUPED_AGG (Series → scalar), used
    directly inside .agg() next to built-ins — completing the UDF
    surface (scalar B-51/52, grouped-map B-53, table B-54, Arrow batch,
    and now grouped-agg). The kernel sums integer cents in pandas
    (int64 — exact, so the undefined intra-group row order cannot move
    a bit; a float sum here would be the classic nondeterminism trap).
    Unlike grouped-map, GROUPED_AGG participates in partial aggregation
    planning as a complete-mode aggregate per group — fine when groups
    fit an Arrow batch (5 types here); heavy groups want the built-in
    sum, which is the documented trade."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sum_cents_udaf(v: pd.Series) -> int:
        # half-away-from-zero, matching the shared cents() helper and the
        # oracle's round() — NOT Series.round(), whose banker's
        # half-to-even diverges by one cent on exact .5 ties (ADVICE r03)
        import numpy as np

        scaled = (v * 100).to_numpy()
        return int(
            (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype("int64").sum()
        )

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        # grouped-agg UDFs cannot mix with built-in aggregates in one
        # .agg() (INVALID_PANDAS_UDF_PLACEMENT) — so the row count is a
        # second tiny UDAF rather than F.count
        return int(len(v))

    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            sum_cents_udaf(F.col("value")).alias("sum_cents"),
            count_udaf(F.col("value")).alias("n"),
        )
        .select(
            "event_type",
            "sum_cents",
            "n",
            F.round(
                F.col("sum_cents").cast("double") / F.col("n") / 100.0, 4
            ).alias("avg_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dedup_greedy_survivors — operational keep-lowest-id near-dup dedup
# ---------------------------------------------------------------------------

_GREEDY_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(string_split(lower(text), ' ')) >= 3
           THEN list_transform(
                  (string_split(lower(text), ' '))[1:len(string_split(lower(text), ' ')) - 2],
                  (x, i) -> concat(x, ' ', string_split(lower(text), ' ')[i + 1],
                                   ' ', string_split(lower(text), ' ')[i + 2]))
           ELSE [lower(text)] END) AS s
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.6
),
dropped AS (
  SELECT DISTINCT id_b FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_dropped,
       (SELECT COUNT(*) FROM documents) - COUNT(*) AS n_survivors,
       (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM dropped)) AS survivor_id_sum
FROM dropped
"""


@query("dedup_greedy_survivors", oracle=_GREEDY_ORACLE, survey_id="north-star")
def dedup_greedy_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPERATIONAL dedup step big pipelines actually run: from every
    near-duplicate pair (3-shingle Jaccard ≥ 0.6, a < b), drop the
    higher id — greedy keep-first, no clustering pass needed (unlike
    dedup_groups_connected, which labels full components). Spark first
    collapses exact copies into distinct-text groups (r11 — see the
    prepass comment below for the factoring proof), then builds
    candidates from a shingle INVERTED-INDEX equi-join over the groups
    (a pair is only scored if it shares ≥1 shingle — at 0.6 Jaccard
    that is guaranteed, so the index is lossless), then verifies exact
    Jaccard on the candidates; the oracle is the all-pairs definition,
    so both the index's completeness and the group factoring are
    hash-proven. The certificate row carries survivor count AND the
    survivor id-sum — a content checksum of WHICH docs survived, not
    just how many. At 100 TB candidates shuffle on shingle hashes;
    nothing ever does |docs|² — nor |copies|² per duplicated text."""
    d = table(spark, sf_dir, "documents")
    # EXACT-GROUP PREPASS (r11, guide §8 "decide with small rows"): the
    # greedy drop rule depends only on doc_id order and lower(text), and
    # exact copies have J = 1 ≥ 0.6, so per-doc survivorship factors
    # through the distinct-text groups: in a group G with min id m(G),
    # every other member is dropped by m(G) (J = 1), and m(G) itself is
    # dropped iff some Jaccard-similar group H has m(H) < m(G) — the
    # exact per-doc rule "∃y<x with J ≥ 0.6", restated on group minima.
    # The O(k²)-prone candidate join therefore runs over DISTINCT texts
    # (sf1 fixture: 4,992 groups for 50,000 docs), so a replicated
    # corpus no longer squares its duplication factor through the
    # verify shuffle, which previously moved the two ~2 KB shingle
    # arrays of 30.2M doc-level candidate pairs (measured 407 s → 4.7 s
    # at sf1, certificate-identical; oracle stays the all-pairs
    # definition, so the factoring is hash-proven).
    # Group by md5(lower(text)) — the repo's exact-dedup key (same as
    # pipeline_dedup_e2e's window) — so the grouping shuffle moves
    # 16-byte digests + counters, not 3 KB texts; the representative
    # text is re-attached by joining the ~|groups| minima back against
    # the corpus scan on doc_id (guide §8: decide on hashes, move
    # payloads once). No broadcast hint: AQE's runtime size check
    # broadcasts the minima locally (KBs) and falls back to the keyed
    # shuffle at 100 TB where |groups| outgrows the broadcast cap.
    stats = d.groupBy(F.md5(F.lower(F.col("text"))).alias("h")).agg(
        F.min("doc_id").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("doc_id").cast("long").alias("idsum"),
    )
    groups = d.join(stats, d["doc_id"] == stats["gid"]).select(
        "gid", "cnt", "idsum", F.lower(F.col("text")).alias("lt")
    )
    # Let-binding idiom (r11, same fix as dedup._shingles): the token
    # array is bound once per row; the unbound form re-split the text
    # three times per shingle element inside the lambda.
    shingle_expr = F.expr(
        """
        transform(array(split(lt, ' ')), ws ->
          array_distinct(
            CASE WHEN size(ws) >= 3
                 THEN transform(slice(ws, 1, size(ws) - 2),
                        (x, i) -> concat(x, ' ', ws[i + 1], ' ', ws[i + 2]))
                 ELSE array(array_join(ws, ' '))
            END))[0]
        """
    )
    # the group-shingle relation feeds FIVE subtrees (index, prefix
    # sizes, both verify sides, base drop stats) — persist it so the
    # corpus is scanned, grouped and shingled ONCE; at 100 TB this is a
    # digest-sized cache, the rescans it avoids are full-corpus
    gsh = groups.select("gid", "cnt", "idsum", shingle_expr.alias("s")).persist()
    inv = gsh.select("gid", F.explode("s").alias("sh"))
    # PREFIX FILTERING (AllPairs/PPJoin): indexing every occurrence makes
    # a shingle shared by k groups emit k² candidate pairs — one hot
    # shingle is quadratic (measured: the sf0.1 drive sat minutes in this
    # join). Exact fix: under any global total order, two sets with
    # J ≥ t (t=0.6) MUST share an element within their first
    # |s| − ceil(t·|s|) + 1 entries, so only that prefix needs indexing.
    # Ordering by (document frequency, shingle) puts hot shingles LAST —
    # out of almost every prefix — while the all-pairs oracle hash-proves
    # the pruning lost nothing. Same shuffle keys, ~|prefix|/|s| of the
    # index rows, no quadratic hot key.
    freq = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w_pref = Window.partitionBy("gid").orderBy("df", "sh")
    # persisted (r11): pref feeds BOTH sides of the candidate self-join;
    # unpersisted, the df-aggregate + rank window + the two joins above
    # it run twice per execution — measured on fresh-plan runs
    # (interleaved, clearCache each round, the gate's one-shot shape):
    # 15.7–28.7 s without the persist vs 5.0–6.6 s with it at sf0.1.
    # The cached relation is (gid, shingle) rows — prefix-sized, ~40% of
    # the index, no payloads — the same digest-scale footprint argument
    # as gsh above.
    pref = (
        inv.join(freq, "sh")
        .withColumn("rn", F.row_number().over(w_pref))
        .join(gsh.select("gid", F.size("s").alias("sz")), "gid")
        .where(F.col("rn") <= F.col("sz") - F.ceil(F.col("sz") * F.lit(0.6)) + 1)
        .select("gid", "sh")
        .persist()
    )
    cand = (
        pref.alias("x")
        .join(pref.alias("y"), (F.col("x.sh") == F.col("y.sh")) & (F.col("x.gid") < F.col("y.gid")))
        .select(F.col("x.gid").alias("id_a"), F.col("y.gid").alias("id_b"))
        .distinct()
    )
    sa = gsh.select(F.col("gid").alias("id_a"), F.col("s").alias("s_a"))
    sb = gsh.select(F.col("gid").alias("id_b"), F.col("s").alias("s_b"))
    jac = F.size(F.array_intersect("s_a", "s_b")) / F.size(
        F.array_distinct(F.concat("s_a", "s_b"))
    )
    # bad groups: their min doc id is dropped by an earlier similar group
    bad = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jac >= 0.6)
        .select("id_b")
        .distinct()
    )
    totals = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("doc_id").cast("long").alias("all_id_sum"),
    )
    # exact-duplicate drops: every non-min member of every group
    base_drop = gsh.agg(
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("n_base"),
        F.coalesce(F.sum(F.col("idsum") - F.col("gid")), F.lit(0))
        .cast("long")
        .alias("base_id_sum"),
    )
    near_drop = bad.agg(
        F.count(F.lit(1)).cast("long").alias("n_near"),
        F.coalesce(F.sum("id_b"), F.lit(0)).cast("long").alias("near_id_sum"),
    )
    drop_stats = base_drop.crossJoin(F.broadcast(near_drop)).select(
        (F.col("n_base") + F.col("n_near")).alias("n_dropped"),
        (F.col("base_id_sum") + F.col("near_id_sum")).alias("dropped_id_sum"),
    )
    return totals.crossJoin(F.broadcast(drop_stats)).select(
        "n_total",
        "n_dropped",
        (F.col("n_total") - F.col("n_dropped")).alias("n_survivors"),
        (F.col("all_id_sum") - F.col("dropped_id_sum")).alias("survivor_id_sum"),
    )


# ---------------------------------------------------------------------------
# win_cohort_ltv — cumulative lifetime-value curve by signup cohort
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         MIN(date_trunc('month', o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
),
aged AS (
  SELECT f.cohort_month,
         (year(o.o_orderdate) - year(f.cohort_month)) * 12
           + (month(o.o_orderdate) - month(f.cohort_month)) AS age_months,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS rev_c
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
per_age AS (
  SELECT cohort_month, age_months, COUNT(*) AS n_orders,
         SUM(rev_c) AS rev_c
  FROM aged GROUP BY cohort_month, age_months
)
SELECT cohort_month, age_months, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(SUM(rev_c) OVER (PARTITION BY cohort_month ORDER BY age_months
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0 AS cum_revenue
FROM per_age
ORDER BY cohort_month, age_months
"""


@query("win_cohort_ltv", oracle=_LTV_ORACLE, survey_id="B-29-ext")
def win_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers bucket by first-order
    month, revenue accumulates along cohort age — the subscription-
    analytics staple (win_retention_cohort counts users; this one
    follows the money). Age is pure INTEGER calendar arithmetic
    ((Δyear)·12 + Δmonth — months_between() returns fractions and
    diverges cross-engine). The running sum windows over the per-
    (cohort, age) aggregate — |cohorts|·|ages| rows — and revenue
    stays integer cents until the final cast. Cohort assignment is one
    keyed aggregate joined back; no window touches the fact."""
    o = table(spark, sf_dir, "orders")
    # cohort via a per-customer window MIN — ONE scan of orders (the
    # groupBy+join-back form scans the fact twice)
    w_cust = Window.partitionBy("o_custkey")
    aged = o.withColumn(
        "cohort_month", F.date_trunc("month", F.min("o_orderdate").over(w_cust))
    ).select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).alias("age_months"),
        cents("o_totalprice").alias("rev_c"),
    )
    per_age = aged.groupBy("cohort_month", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rev_c").alias("rev_c"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_age.select(
            "cohort_month",
            "age_months",
            "n_orders",
            (F.sum("rev_c").over(w).cast("double") / 100.0).alias("cum_revenue"),
        )
        .orderBy("cohort_month", "age_months")
    )


# ---------------------------------------------------------------------------
# win_markov_transitions — event-type transition matrix
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
),
c AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
tot AS (
  SELECT cur, SUM(n) AS row_n FROM c GROUP BY cur
)
SELECT c.cur AS cur, c.nxt AS nxt, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / CAST(t.row_n AS DOUBLE), 4) AS p
FROM c JOIN tot t ON t.cur = c.cur
ORDER BY c.cur, c.nxt
"""


@query("win_markov_transitions", oracle=_MARKOV_ORACLE, survey_id="B-29-ext")
def win_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream (P(next type | current type)) — the behavioral-model
    fit step (and the events analog of text_ngram_lm). One LEAD pass
    per user (total-ordered by ts + event_id), exact transition counts,
    row-normalized with a single rounded division. The matrix is
    |types|² — the fact collapses immediately, so at 100 TB this is
    one user-keyed window + two tiny aggregates."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    # row total as a window over the 25-row matrix — the Q11 pattern;
    # a groupBy+join here would recompute the events window subtree twice
    c = c.withColumn("row_n", F.sum("n").over(Window.partitionBy("cur")))
    return (
        c
        .select(
            "cur",
            "nxt",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("row_n").cast("double"), 4).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


# ---------------------------------------------------------------------------
# win_rolling_zscore — trailing-window anomaly score from exact sums
# ---------------------------------------------------------------------------

_ROLLING_Z_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1
),
walk AS (
  SELECT h, n,
         SUM(n)     OVER tw AS s1,
         SUM(n * n) OVER tw AS s2,
         COUNT(*)   OVER tw AS k
  FROM hourly
  WINDOW tw AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT h, CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
             / sqrt(CAST(s2 AS DOUBLE) / k
                    - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k)),
             4) AS z,
       CASE WHEN abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
             / sqrt(CAST(s2 AS DOUBLE) / k
                    - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k)))
            > 3.0 THEN 1 ELSE 0 END AS is_burst
FROM walk
WHERE k >= 12
  AND CAST(s2 AS DOUBLE) / k
      - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k) > 0
ORDER BY h
"""


@query("win_rolling_zscore", oracle=_ROLLING_Z_ORACLE, survey_id="B-30-ext")
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score burst detection: each hour scored against the
    TRAILING 24h baseline (frame ends at 1 PRECEDING — the current
    observation never contaminates its own baseline, the same leakage
    rule as feature_pit_join). Rolling mean/variance come from exact
    BIGINT Σn and Σn² window sums — one window pass, no
    per-frame recompute — then one sqrt/division per row (§5.3). Warmup
    (<12 baseline hours) and zero-variance windows are excluded
    explicitly in both engines rather than left to NaN semantics. The
    fact collapses to hourly counts first; at 100 TB the window input
    is calendar-sized."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tw = Window.orderBy("h").rowsBetween(-24, -1)
    walk = (
        hourly.withColumn("s1", F.sum("n").over(tw))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(tw))
        .withColumn("k", F.count(F.lit(1)).over(tw))
    )
    mean = F.col("s1").cast("double") / F.col("k")
    var = F.col("s2").cast("double") / F.col("k") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        walk.where((F.col("k") >= 12) & (var > 0))
        .select(
            "h",
            F.col("n").cast("long").alias("n"),
            F.round(z, 4).alias("z"),
            F.when(F.abs(z) > 3.0, 1).otherwise(0).alias("is_burst"),
        )
        .orderBy("h")
    )


# ---------------------------------------------------------------------------
# text_decode_ids_roundtrip — tokenizer bijectivity certificate
# ---------------------------------------------------------------------------

_DECODE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_exact
FROM documents
"""


@query("text_decode_ids_roundtrip", oracle=_DECODE_ORACLE, survey_id="B-59-ext")
def text_decode_ids_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip integrity: encode every document to vocab
    ids (text_encode_ids' exact pipeline), DECODE the ids back through
    the inverted vocab, and prove md5(decoded) == md5(lower(original))
    for every document. The oracle states the invariant's consequence —
    all N docs round-trip — so any id collision, ordering bug, or lossy
    join in either direction breaks the hash. This is the certificate a
    training pipeline needs before committing tokenized shards: the
    ids are a bijection over the corpus, not just plausible integers.
    Same broadcast-vocab joins as encode; nothing new shuffles."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "tok_id",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("tok"))),
        )
        .select("tok", "tok_id")
        .persist()  # encode + decode sides; vocab-sized, subtree is a full tokenize
    )
    encoded = toks.join(F.broadcast(vocab), "tok").select("doc_id", "pos", "tok_id")
    decoded = (
        encoded.join(F.broadcast(vocab), "tok_id")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("decoded_text")
        )
    )
    check = decoded.join(d, "doc_id").select(
        F.when(
            F.md5("decoded_text") == F.md5(F.lower(F.col("text"))), 1
        )
        .otherwise(0)
        .alias("ok")
    )
    return check.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ok").cast("long").alias("n_roundtrip_exact"),
    )


# ---------------------------------------------------------------------------
# dedup_incremental_ingest — dedup a delta batch against the base corpus
# ---------------------------------------------------------------------------

_INC_DEDUP_ORACLE = """
WITH base AS (
  SELECT md5(lower(text)) AS h FROM documents WHERE doc_id < 400
),
delta AS (
  SELECT doc_id, md5(lower(text)) AS h FROM documents WHERE doc_id >= 400
  UNION ALL
  SELECT doc_id + 10000, md5(lower(text)) FROM documents WHERE doc_id < 50
),
kept AS (
  SELECT doc_id FROM delta WHERE h NOT IN (SELECT h FROM base)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM delta) AS n_delta,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       (SELECT COUNT(*) FROM delta) - COUNT(*) AS n_dropped_as_known,
       CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS kept_id_sum
FROM kept
"""


@query("dedup_incremental_ingest", oracle=_INC_DEDUP_ORACLE, survey_id="north-star")
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a NEW batch (docs ≥ 400 plus 50
    re-crawled base docs under fresh ingest ids — the fixture has no
    organic cross-batch exact dups) checked against the EXISTING corpus
    (doc_id < 400) — the daily-crawl shape,
    where re-deduping 100 TB of history per batch is the thing you must
    never do. The delta anti-joins the base on md5 digests: the base
    side reduces to 16-byte hashes (in production, a persisted digest
    index or the bloom-prefilter op), the delta is the only full-text
    scan, and cost is O(delta + |base digests|). The certificate
    carries kept/dropped counts AND the kept id-sum — WHICH docs
    survived, hash-checked. NOT IN is safe here (md5 is never NULL);
    the null trap is pinned separately by sql_not_in_nulls."""
    d = table(spark, sf_dir, "documents")
    base = d.where(F.col("doc_id") < 400).select(
        F.md5(F.lower(F.col("text"))).alias("h")
    ).distinct()
    fresh = d.where(F.col("doc_id") >= 400).select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("h")
    )
    # the re-crawled half of the delta: 50 base docs re-fetched under new
    # ingest ids (the fixture has no cross-batch exact dups of its own)
    replayed = d.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.md5(F.lower(F.col("text"))).alias("h"),
    )
    delta = fresh.unionByName(replayed).persist()  # reused by kept + totals
    kept = delta.join(base, "h", "left_anti")
    totals = delta.agg(F.count(F.lit(1)).cast("long").alias("n_delta"))
    kept_stats = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("kept_id_sum"),
    )
    return totals.crossJoin(F.broadcast(kept_stats)).select(
        "n_delta",
        "n_kept",
        (F.col("n_delta") - F.col("n_kept")).alias("n_dropped_as_known"),
        "kept_id_sum",
    )


# ---------------------------------------------------------------------------
# sql_order_by_all — ORDER BY ALL parity
# ---------------------------------------------------------------------------

_OBA_ORACLE = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY ALL
"""


@query("sql_order_by_all", oracle=_OBA_ORACLE, survey_id="B-33-ext")
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL parity (the GROUP BY ALL companion —
    sql_group_by_all): both engines support the shorthand, and both
    must expand it to the same left-to-right column list INCLUDING the
    aggregate output column. Run as verbatim SQL through spark.sql so
    the engine's own parser does the expansion — the point is parser
    parity, not a DataFrame translation."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        FROM v_lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# win_session_paths — top behavioral paths through sessions
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM marked
),
paths AS (
  SELECT user_id, sess_no,
         array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
  FROM sess GROUP BY user_id, sess_no
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 15
"""


@query("win_session_paths", oracle=_PATHS_ORACLE, survey_id="B-47-ext")
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral paths: sessionize (30-min gap rule, the
    win_sessionize machinery), serialize each session's ordered
    event-type sequence into a path string, count path frequencies —
    the product-analytics "how do users actually move" query. Path
    assembly is sort_array over (ts, event_id) structs (total order —
    collect_list alone is §5.3-illegal), so the SAME path string comes
    out of both engines. Cardinality collapses fact → sessions →
    distinct paths; the top-15 is total-ordered with the path itself
    as tiebreak."""
    ev = table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_seq))
    marked = ev.withColumn(
        "is_start",
        F.when(F.lag("ts").over(w_seq).isNull() | (gap > 1800), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("sess_no", F.sum("is_start").over(w_run))
    paths = sess.groupBy("user_id", "sess_no").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# agg_benford_audit — first-digit distribution vs Benford's law
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders
  WHERE o_totalprice > 0
)
SELECT d,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM digits), 4) AS observed_p,
       round(log10(1.0 + 1.0 / d), 4) AS benford_p
FROM digits
GROUP BY d
ORDER BY d
"""


@query("agg_benford_audit", oracle=_BENFORD_ORACLE, survey_id="B-25-ext")
def agg_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    financial-forensics screen (fabricated numbers flunk the log10
    curve; the synthetic fixture flunks it too, visibly, which is the
    point of publishing observed vs expected side by side). First
    digit comes from the integer-cents STRING prefix — no float log
    tricks, so the digit extraction is trivially cross-engine; the two
    rounded ratios are the only doubles. One hash aggregate over a
    1-column scan."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    # grand total as a window over the 9-row digit aggregate — one scan
    # (a separate count subtree would rescan orders)
    return (
        digits.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n_total", F.sum("n").over(Window.partitionBy()))
        .select(
            "d",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 4).alias(
                "observed_p"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("d")), 4).alias("benford_p"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# text_bpe_merges — distributed BPE tokenizer-training kernel (3 merges)
# ---------------------------------------------------------------------------

def _bpe_iter_sql(prev: str, best: str, nxt_t: str) -> str:
    """One unrolled DuckDB BPE iteration: pick the best adjacent pair
    from ``prev``, apply it, emit ``nxt_t``. Kept as a helper so the
    3-iteration oracle below is visibly the same algorithm three times."""
    return f"""
p_{best} AS (
  SELECT tok AS w1, nxt AS w2, COUNT(*) AS c
  FROM (SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM {prev})
  WHERE nxt IS NOT NULL AND tok <> nxt
  GROUP BY 1, 2
),
{best} AS (SELECT w1, w2, c FROM p_{best} ORDER BY c DESC, w1, w2 LIMIT 1),
{nxt_t} AS (
  SELECT doc_id, pos,
         CASE WHEN is_m THEN w1 || '_' || w2 ELSE tok END AS tok
  FROM (
    SELECT doc_id, pos, tok, w1, w2, is_m,
           lag(is_m) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_m
    FROM (
      SELECT t.doc_id, t.pos, t.tok, b.w1, b.w2,
             (t.tok = b.w1
              AND lead(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) = b.w2)
               AS is_m
      FROM {prev} t, {best} b
    )
  )
  WHERE NOT COALESCE(prev_m, FALSE)
)"""


_BPE_ORACLE = f"""
WITH t0 AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
  FROM (SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents)
),{_bpe_iter_sql('t0', 'b0', 't1')},{_bpe_iter_sql('t1', 'b1', 't2')},{_bpe_iter_sql('t2', 'b2', 't3')}
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS iter, w1, w2, w1 || '_' || w2 AS merged,
         CAST(c AS BIGINT) AS n_pairs FROM b0
  UNION ALL
  SELECT 2, w1, w2, w1 || '_' || w2, CAST(c AS BIGINT) FROM b1
  UNION ALL
  SELECT 3, w1, w2, w1 || '_' || w2, CAST(c AS BIGINT) FROM b2
) ORDER BY iter
"""


def _bpe_apply(toks: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one BPE merge (the 1-row ``best`` broadcast as (w1, w2)):
    flag matches with lead(), drop second halves with lag(), substitute
    the merged symbol. Declarative because candidates are restricted to
    w1 ≠ w2, so greedy matches cannot overlap and no sequential fold is
    needed — match flags are position-local."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = (
        toks.crossJoin(F.broadcast(best.select("w1", "w2")))
        .withColumn(
            "is_m",
            (F.col("tok") == F.col("w1")) & (F.lead("tok").over(w) == F.col("w2")),
        )
        .withColumn("prev_m", F.lag("is_m").over(w))
    )
    return flagged.where(~F.coalesce("prev_m", F.lit(False))).select(
        "doc_id",
        "pos",
        F.when(
            F.col("is_m"), F.concat("w1", F.lit("_"), "w2")
        ).otherwise(F.col("tok")).alias("tok"),
    )


def _bpe_best(toks: DataFrame) -> DataFrame:
    """Most frequent adjacent pair with w1 ≠ w2 (count DESC, pair ASC —
    a total order, so the chosen merge is engine-deterministic)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .groupBy(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(1)
    )


@query("text_bpe_merges", oracle=_BPE_ORACLE, survey_id="north-star")
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training — 3 merge iterations, fully
    declarative, no collect and no Python in the row path. Each
    iteration: (1) count adjacent token pairs, (2) pick the argmax
    merge as a 1-row broadcast (count DESC, pair ASC — total order),
    (3) re-sequence the corpus with two window functions: lead() flags
    (w1, w2) matches, lag() drops the consumed second halves.

    The declarative trick: candidates are restricted to w1 ≠ w2 (the
    standard practical simplification — self-pairs like ('a','a') are
    skipped), which makes greedy left-to-right matches provably
    non-overlapping, so merge application needs no sequential fold —
    it is a per-position decision two window frames wide. The DuckDB
    oracle unrolls the SAME three iterations as CTE chains, so pair
    choice, application, and the next iteration's counts are all
    hash-verified cross-engine.

    100 TB shape: each iteration is one pair-count aggregate plus one
    doc-partitioned window pass over the token stream; the merge table
    broadcasts (1 row). Real trainers amortize by counting on a sample
    and batching non-interacting merges per pass — both compose with
    this kernel unchanged. The per-iteration token relation is
    persisted: it feeds the next iteration's count AND apply subtrees
    (Catalyst would otherwise re-expand the whole chain each time,
    compounding like graph_triangle_count did)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("p", "tok"),
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("pos"), "tok")
    merges = []
    for it in (1, 2, 3):
        toks = toks.persist()
        best = _bpe_best(toks).persist()
        merges.append(
            best.select(
                F.lit(it).cast("long").alias("iter"),
                "w1",
                "w2",
                F.concat("w1", F.lit("_"), "w2").alias("merged"),
                F.col("c").cast("long").alias("n_pairs"),
            )
        )
        toks = _bpe_apply(toks, best)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("iter")


# ---------------------------------------------------------------------------
# sink_training_shards — sharded export + integrity manifest
# ---------------------------------------------------------------------------

_SHARD_MANIFEST_ORACLE = """
SELECT doc_id % 8 AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
         AS n_tokens,
       CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
         AS content_fp
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


@query("sink_training_shards", oracle=_SHARD_MANIFEST_ORACLE, survey_id="B-5-ext")
def sink_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded training-data export with an integrity manifest — the
    step that commits a prepared corpus to storage for the trainer.
    Documents are hash-assigned to 8 shards (doc_id % 8 — deterministic,
    reproducible re-export), written as one parquet directory per shard
    key via partitionBy, READ BACK, and summarized into a per-shard
    manifest: doc count, token count, and an order-independent content
    fingerprint (sum of the first 8 md5 hex digits per doc — both
    engines parse the same prefix, so a single flipped byte anywhere in
    any shard breaks the hash row). Because the manifest is computed
    from the files on disk, this certifies the write+read round trip,
    not just the logical plan. 100 TB shape: partitionBy on a bounded
    key (8 dirs) with hash-distributed rows — no sort, no skew; the
    manifest is one partial+final aggregate over the written data, the
    same pass a validation job runs before training starts."""
    import os

    d = table(spark, sf_dir, "documents").withColumn(
        "shard_id", (F.col("doc_id") % 8).cast("long")
    )
    out = os.path.join(scratch_dir("sink_training_shards", sf_dir), "corpus")
    d.write.mode("overwrite").partitionBy("shard_id").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long"))
            .cast("long")
            .alias("content_fp"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# win_match_recognize — MATCH_RECOGNIZE-lite: regex over event sequences
# ---------------------------------------------------------------------------

_MATCH_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       regexp_extract(s, 'v+c+p') AS first_match,
       CAST(len(regexp_replace(s, 'v+c+p', '#', 'g'))
            - len(replace(regexp_replace(s, 'v+c+p', '#', 'g'), '#', ''))
         AS BIGINT) AS n_matches
FROM seq
ORDER BY user_id
"""


@query("win_match_recognize", oracle=_MATCH_ORACLE, survey_id="B-29-ext")
def win_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regular-expression patterns over ordered
    per-user event sequences — the SQL:2016 row-pattern feature Spark
    lacks, recovered by encoding each user's (ts, event_id)-ordered
    event-type initials as a string and running the pattern as a plain
    regex ('v+c+p': a run of views, then clicks, then a purchase —
    contiguous, the strict MATCH_RECOGNIZE reading). Emits the first
    match and the non-overlapping match count (regexp semantics are
    leftmost-earliest in both engines, so counts agree exactly).

    Plan: one groupBy(user) aggregate — the sequence string is built
    with sort_array over (ts, event_id, letter) structs (total order,
    §5.3), no window, no self-join; the regex work is row-local on
    |users| rows. 100 TB shape: state per user is their event-initial
    string — for bounded sessions this is the standard trick; for
    unbounded histories you'd sessionize first (win_sessionize) and
    pattern-match within sessions, which composes with this operator
    unchanged."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("l")
                        )
                    )
                ),
                lambda s: s["l"],
            ),
            "",
        ).alias("s"),
    )
    marked = F.regexp_replace("s", "v+c+p", "#")
    return seq.select(
        "user_id",
        "n_events",
        F.regexp_extract("s", "v+c+p", 0).alias("first_match"),
        (
            F.length(marked) - F.length(F.regexp_replace(marked, "#", ""))
        ).cast("long").alias("n_matches"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# win_touch_attribution — last-touch revenue attribution
# ---------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY channel
"""


@query("win_touch_attribution", oracle=_ATTRIB_ORACLE, survey_id="B-29-ext")
def win_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution — the marketing-analytics staple:
    each purchase's value is credited to the most recent PRIOR view or
    click by the same user ('direct' when none). One pass: a
    last-ignore-nulls window frame ending 1 row before current carries
    the latest touch channel forward — no self-join, no as-of join, and
    the frame is (ts, event_id)-total-ordered so credit assignment is
    engine-deterministic. Revenue stays integer cents (§5.3). 100 TB
    shape: a single user-partitioned sort-window plus a 3-group
    aggregate; the same plan as win_sessionize, which already proved
    the shape scales."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("view", "click"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("channel")
    )
