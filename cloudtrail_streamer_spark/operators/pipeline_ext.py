"""Pipeline/maintenance surface: column profiling, MERGE-style upsert,
SCD2 interval history, LLM-document chunking, time-series gap fill,
exact z-score outlier detection, and range-clustered layout.

These are the table-maintenance and training-data-pipeline operations a
100 TB deployment runs *around* the analytical queries — the reference's
forwarder feeds a lake that still needs profiling, CDC merge, history
tracking, and layout clustering downstream (SURVEY.md §2.B "-ext"
widening; upstream has no analog, this is the north-star surface).

Determinism (SURVEY.md §5.3): money stays in integer cents (BIGINT /
DECIMAL(38,0) — exact on both engines), interval endpoints carry
unique-key tiebreaks, the outlier test is exact integer arithmetic
(no float σ threshold), and chunk boundaries are pure integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query

# ---------------------------------------------------------------------------
# profile_columns — data-quality profiling (null rate + exact cardinality)
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_custkey",
    "o_orderdate",
    "o_orderkey",
    "o_orderpriority",
    "o_orderstatus",
    "o_totalprice",
)

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders"""
    for c in _PROFILE_COLS
)


@query("profile_columns", oracle=_PROFILE_ORACLE, survey_id="B-25-ext")
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift / data-quality profile: per-column null count and
    EXACT distinct cardinality in one scan. The multi-column distinct
    compiles to a single Expand-based partial+final aggregate — one pass
    over the fact table, |cols|× expanded rows shuffled but pre-reduced
    map-side. At 100 TB prefer approx_count_distinct per column (HLL,
    mergeable, no Expand blowup) when ±2% cardinality suffices; exact
    mode here is the oracle-checkable contract."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    one = o.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in _PROFILE_COLS)
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_null, n_distinct)",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# merge_upsert — MERGE INTO semantics as a full-outer join
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH tgt AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 3 <> 0
), src AS (
  SELECT o_orderkey,
         (CAST(round(o_totalprice * 100, 0) AS BIGINT) * 110) // 100
           AS new_cents
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT COALESCE(tgt.o_orderkey, src.o_orderkey) AS o_orderkey,
       COALESCE(src.new_cents, tgt.price_cents) AS price_cents,
       CASE WHEN tgt.o_orderkey IS NOT NULL AND src.o_orderkey IS NOT NULL
              THEN 'update'
            WHEN src.o_orderkey IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM tgt FULL JOIN src USING (o_orderkey)
"""


@query("merge_upsert", oracle=_MERGE_ORACLE, survey_id="B-5-ext")
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (upsert) semantics: a change feed applied to a target
    snapshot via ONE full-outer join — matched rows take the source
    value, unmatched source rows insert, unmatched target rows persist.
    This is the batch kernel behind every foreachBatch-upsert sink
    (streaming/windows_stream.py stream_upsert_keyed). At 100 TB: a
    single sort-merge join on the primary key; bucket both sides by key
    (join_bucketed_colocated shape) and the merge is zero-exchange.
    Prices stay in integer cents; the 10% uplift is integer DIV — exact
    on both engines at any scale."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("price_cents")
    )
    tgt = o.filter(F.col("o_orderkey") % 3 != 0)
    src = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.expr("price_cents * 110 DIV 100").alias("new_cents")
    )
    m = tgt.alias("t").join(src.alias("s"), "o_orderkey", "full_outer")
    has_t = F.col("t.price_cents").isNotNull()
    has_s = F.col("s.new_cents").isNotNull()
    return m.select(
        "o_orderkey",
        F.coalesce("s.new_cents", "t.price_cents").alias("price_cents"),
        F.when(has_t & has_s, "update")
        .when(has_s, "insert")
        .otherwise("keep")
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# scd2_intervals — slowly-changing-dimension type-2 history
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
  FROM events
), runs AS (
  SELECT user_id, event_type, MIN(ts) AS valid_from,
         MIN(event_id) AS first_event_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM seq GROUP BY user_id, event_type, island
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, first_event_id)
         AS valid_to,
       n_events
FROM runs
"""


@query("scd2_intervals", oracle=_SCD2_ORACLE, survey_id="B-28-ext")
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: collapse each user's event stream into
    validity intervals per consecutive event_type run (gaps-and-islands
    via the difference of two row_numbers), then chain valid_to from the
    next interval's valid_from. Open intervals end NULL. One shuffle on
    user_id serves all three window passes AND the groupBy (same
    partitioning, no re-exchange); ordering ties broken by unique
    event_id (SURVEY §5.3). At 100 TB this is the standard
    dimension-history materialization — partition the sink by
    valid_from date for pruned as-of lookups."""
    ev = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_user) - F.row_number().over(w_run)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        # Unique chain tiebreak: two runs of one user can share valid_from
        # when same-ts events of different event_types exist; ordering the
        # LEAD chain by (valid_from, first_event_id) in BOTH engines keeps
        # valid_to deterministic (ADVICE r02 #1).
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_chain = Window.partitionBy("user_id").orderBy("valid_from", "first_event_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_chain).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# text_chunk_documents — fixed-budget overlapping chunks for LLM training
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48  # 16-token overlap

_CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT doc_id,
       CAST(gs AS BIGINT) AS chunk_id,
       CAST(gs * {_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST(gs * {_STRIDE} + {_CHUNK}, n_tokens) AS BIGINT) AS end_tok,
       CAST(LEAST(gs * {_STRIDE} + {_CHUNK}, n_tokens) - gs * {_STRIDE} AS BIGINT)
         AS chunk_tokens
FROM (SELECT doc_id, n_tokens,
             unnest(generate_series(0, (n_tokens - 1) // {_STRIDE})) AS gs
      FROM d)
"""


@query("text_chunk_documents", oracle=_CHUNK_ORACLE, survey_id="B-59-ext")
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM training-data chunking: split each document into 64-token
    windows on a 48-token stride (16-token overlap), emitting exact
    token offsets. Boundaries are pure integer division over the
    whitespace token count — no string reassembly, so the chunk spec is
    oracle-checkable and the (later, Python-side) slice step stays an
    embarrassingly-parallel map. Explode fan-out is bounded by
    n_tokens/stride per row; at 100 TB this runs scan→explode with zero
    shuffles and no skew (chunk count is proportional to doc length)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    exploded = toks.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n_tokens - 1) DIV {_STRIDE}"))
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _STRIDE
    end = F.least(start + _CHUNK, F.col("n_tokens"))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - start).cast("long").alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# events_gap_fill — dense hourly spine with zero-filled gaps
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
), spine AS (
  SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR))
           AS hour_start
  FROM (SELECT DISTINCT event_type FROM events) t, bounds b
), counts AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.hour_start, COALESCE(c.n, 0) AS n
FROM spine s LEFT JOIN counts c USING (event_type, hour_start)
"""


@query("events_gap_fill", oracle=_GAP_FILL_ORACLE, survey_id="B-20-ext")
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense (event_type × hour) spine over the
    observed range, left-joined to hourly counts, zeros where no events
    landed. The spine is generated DISTRIBUTED — global bounds come from
    a broadcast 1-row aggregate (the tfidf no-collect pattern), crossed
    with the distinct-type dim and exploded via sequence(); no driver
    round-trip. Counts pre-aggregate before the join, so the join input
    is |types|·|hours| rows regardless of fact size — at 100 TB the
    spine side is still tiny and broadcasts."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    # bounds and the type dim both derive from the hourly aggregate
    # (min/max of truncated hours == truncated min/max ts), so the fact
    # scans ONCE; counts is |types|·|hours|-sized, persisted for its
    # three consumers
    counts = (
        ev.groupBy("event_type", hour.alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    bounds = counts.agg(
        F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1")
    )
    types = counts.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour_start"),
    )
    return spine.join(counts, ["event_type", "hour_start"], "left").select(
        "event_type",
        "hour_start",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# agg_outlier_zscore — exact integer 2σ outlier test (no float threshold)
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vc FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(vc AS HUGEINT)) AS sm,
         SUM(CAST(vc AS HUGEINT) * vc) AS q
  FROM v GROUP BY event_type
)
SELECT v.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (
         WHERE (s.n * vc - s.sm) * (s.n * vc - s.sm) > 4 * (s.n * q - s.sm * s.sm)
       ) AS BIGINT) AS n_outliers,
       CAST(COALESCE(SUM(vc) FILTER (
         WHERE (s.n * vc - s.sm) * (s.n * vc - s.sm) > 4 * (s.n * q - s.sm * s.sm)
       ), 0) AS BIGINT) AS outlier_cents
FROM v JOIN s USING (event_type)
GROUP BY v.event_type
"""

_D38 = "decimal(38,0)"


@query("agg_outlier_zscore", oracle=_OUTLIER_ORACLE, survey_id="B-25-ext")
def agg_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 2σ outlier detection with an EXACT integer test:
    |v − μ| > 2σ  ⟺  (n·v − S)² > 4·(n·Q − S²)  over integer cents
    (S = Σv, Q = Σv²), so no float σ is ever compared — the engines
    can't disagree on a boundary value. Arithmetic runs in DECIMAL(38,0)
    (Spark Decimal128 / DuckDB HUGEINT): exact up to ~1e38, which covers
    n·Q at 100 TB row counts. Two passes: a 5-row stats aggregate
    broadcast back onto the feed, then a partial+final count — the
    standard scale shape for any μ/σ-dependent filter."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("vc")
    )
    vd = F.col("vc").cast(_D38)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_D38).alias("n_d"),
        F.sum(vd).cast(_D38).alias("sm"),
        F.sum(vd * F.col("vc")).cast(_D38).alias("q"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    dev = F.col("n_d") * vd - F.col("sm")
    is_out = (dev * dev) > (
        F.lit(4).cast(_D38) * (F.col("n_d") * F.col("q") - F.col("sm") * F.col("sm"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # coalesce like outlier_cents: an all-NULL value group yields SUM=NULL
        # in Spark but 0 from the oracle's COUNT(*) FILTER (ADVICE r02 #3).
        F.coalesce(F.sum(is_out.cast("long")), F.lit(0)).cast("long").alias("n_outliers"),
        F.coalesce(F.sum(F.when(is_out, F.col("vc"))), F.lit(0))
        .cast("long")
        .alias("outlier_cents"),
    )


# ---------------------------------------------------------------------------
# layout_cluster_ranges — range-clustered write layout (R-tier)
# ---------------------------------------------------------------------------


_LAYOUT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(user_id) AS BIGINT) AS min_key,
       CAST(MAX(user_id) AS BIGINT) AS max_key,
       TRUE AS ranges_disjoint,
       TRUE AS rows_covered
FROM events
"""


@query("layout_cluster_ranges", oracle=_LAYOUT_ORACLE, survey_id="B-5-ext")
def layout_cluster_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered layout for scan locality: repartitionByRange on
    the cluster key + sortWithinPartitions gives each output file a
    disjoint key range (min/max per file → parquet footer stats →
    row-group skipping on key predicates downstream). This is the write
    path that makes `scan_pruned`-style reads cheap at 100 TB; Z-order
    generalizes it to 2 keys.

    Tier H via an invariant certificate (upgraded r9 from R): the
    sampled range SPLIT POINTS are engine-internal and can differ run
    to run, but the layout's CONTRACT is boundary-independent — every
    partition's [min,max] key range strictly precedes the next
    (range partitioning puts all rows of one key in one partition) and
    no row is lost. The hashed row is (total rows, global min/max key,
    disjointness, coverage); the oracle recomputes the exact values and
    pins the booleans TRUE, so a broken partitioner (overlapping
    ranges, dropped rows) fails the driver gate. Per-partition
    summaries remain asserted in tests/test_engine.py."""
    ev = table(spark, sf_dir, "events")
    clustered = ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id", "ts"
    )
    summaries = (
        clustered.select(F.spark_partition_id().alias("pid"), "user_id")
        .groupBy("pid")
        .agg(
            F.min("user_id").alias("min_key"),
            F.max("user_id").alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    nxt = F.lead("min_key").over(Window.orderBy("min_key", "pid"))
    cert = summaries.select(
        "n_rows",
        "min_key",
        "max_key",
        (F.coalesce(nxt > F.col("max_key"), F.lit(True))).alias("disj"),
    ).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.min("min_key").cast("long").alias("min_key"),
        F.max("max_key").cast("long").alias("max_key"),
        F.bool_and("disj").alias("ranges_disjoint"),
    )
    total = ev.agg(F.count(F.lit(1)).alias("tot"))
    return cert.crossJoin(total).select(
        "n_rows",
        "min_key",
        "max_key",
        "ranges_disjoint",
        (F.col("n_rows") == F.col("tot")).alias("rows_covered"),
    )


_DIM_ASOF_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
  FROM events
), runs AS (
  SELECT user_id, event_type, MIN(ts) AS valid_from,
         MIN(event_id) AS first_event_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM seq GROUP BY user_id, event_type, island
), dim AS (
  SELECT user_id, event_type AS dim_state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, first_event_id)
           AS valid_to
  FROM runs
), probe AS (
  SELECT event_id, user_id, ts FROM events WHERE event_id % 25 = 0
)
SELECT p.event_id, p.user_id, d.dim_state
FROM probe p JOIN dim d
  ON p.user_id = d.user_id
 AND p.ts >= d.valid_from
 AND (d.valid_to IS NULL OR p.ts < d.valid_to)
"""


@query("join_dim_snapshot_asof", oracle=_DIM_ASOF_ORACLE, survey_id="B-19-ext")
def join_dim_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 version lookup — the join every dimensional warehouse
    runs: a probe slice of events joined to the scd2_intervals history
    ON user + event-time falling inside [valid_from, valid_to), open
    intervals matching everything after their start. Composes the SCD2
    build (itself hash-checked) with an interval predicate riding on
    the user_id equi-key, so the plan is a hash join with a residual
    range filter — never a BNLJ — and at 100 TB the dimension side
    prunes by valid_from date partitioning. Exactly one version matches
    per probe row by the disjointness of SCD2 intervals."""
    dim = scd2_intervals(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("dim_state"),
        "valid_from",
        "valid_to",
    )
    probe = (
        table(spark, sf_dir, "events")
        .where(F.col("event_id") % 25 == 0)
        .select("event_id", "user_id", "ts")
    )
    cond = (
        (probe.user_id == dim.user_id)
        & (probe.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (probe.ts < dim.valid_to))
    )
    return probe.join(dim, cond).select("event_id", probe.user_id, "dim_state")


_PRETRAIN_E2E_ORACLE = """
WITH scored AS (
  SELECT doc_id, text, lang, n_chars,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(lower(text), ' '),
              w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS BIGINT)
           AS n_stop
  FROM documents
), dedup AS (
  SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
  FROM scored
), kept AS (
  SELECT doc_id, lang, n_chars, n_tokens,
         ((doc_id & 2147483647) * 2654435761) % 100 AS b
  FROM dedup
  WHERE rn = 1
    AND n_chars BETWEEN 20 AND 10000
    AND n_tokens >= 5
    AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
)
SELECT CASE WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val' ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM kept
GROUP BY 1, 2
"""


@query("pipeline_pretrain_e2e", oracle=_PRETRAIN_E2E_ORACLE, survey_id="B-62-ext")
def pipeline_pretrain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pretraining-data funnel as ONE declarative plan:
    quality gate (length bounds + stopword ratio) → exact dedup (min
    doc_id per normalized-text md5) → leak-proof train/val/test split
    (pure hash of doc_id — identical to split_train_val_test, so
    documents can never migrate across splits on re-runs) → per
    (split, lang) corpus accounting. This is the composition the
    individual text_filter_quality / dedup_exact / split ops exist for;
    expressing it as one DataFrame lets Catalyst fuse the whole funnel
    into a single scan + one window shuffle + one agg shuffle — no
    intermediate materialization, which is precisely the 100 TB shape
    (three passes over a candidate corpus vs one). The doc_id_sum /
    min_doc_id columns make the kept-set membership itself hash-checked,
    not just its size.

    Bench note (r8, BENCH_DETAIL ``sf10.pretrain_sf10``): the sf1
    marginal prints high (~16) but is a DENOMINATOR artifact — DuckDB's
    sf0.1r→sf1 delta is 40-60 ms against a 3-stage Spark plan whose
    absolute sf1 time is <1 s. The sf10 decade, where both deltas are
    real, measures marginal ≈1.15 (Spark Δ0.268 s vs DuckDB Δ0.234 s
    on 10× data). An A/B that dropped the text column before the
    dedup-window shuffle (slim ~100 B rows instead of ~3 KB) measured
    the SAME sf10 time (1.16-1.44 s vs 1.21 s) because the quality
    gate must tokenize every doc map-side either way — the scan stage,
    not the shuffle, is the scaling term, so the fused plan stands."""
    from cloudtrail_streamer_spark.operators.text import _STOPWORDS

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORDS))).cast("long")
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    b = (F.col("doc_id").bitwiseAND(F.lit(2147483647)) * F.lit(2654435761)) % 100
    split = F.when(b < 96, "train").when(b < 98, "val").otherwise("test")
    return (
        d.select("doc_id", "text", "lang", "n_chars")
        .withColumn("n_tokens", n_tokens)
        .withColumn("ratio", n_stop.cast("double") / F.col("n_tokens"))
        .withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") == 1)
            & F.col("n_chars").between(20, 10000)
            & (F.col("n_tokens") >= 5)
            & (F.col("ratio") < 0.5)
        )
        .groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
    )


_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med,
         median(abs(e.value - m.med)) OVER (PARTITION BY e.event_type) AS mad
  FROM events e JOIN med m USING (event_type)
)
SELECT event_type,
       round(MIN(med), 4) AS med,
       round(MIN(mad), 4) AS mad,
       CAST(COALESCE(SUM(CASE WHEN abs(value - med) > 4.4478 * mad
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM dev
GROUP BY event_type
"""


@query("agg_outlier_mad", oracle=_MAD_ORACLE, survey_id="B-25-ext")
def agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    companion to agg_outlier_zscore for heavy-tailed feeds, where mean/
    stddev are themselves dragged by the outliers they should flag
    (median and MAD have a 50% breakdown point; the z-score pair, 0%).
    Threshold |x − med| > 3·1.4826·MAD (the normal-consistency constant,
    folded to 4.4478). Exact medians via the percentile aggregate —
    both engines sort the same doubles and interpolate with exact-in-
    IEEE 0.5 weights, so the medians are bit-identical. Two passes:
    per-group median, then a window for the deviation median — same
    grouped-shuffle shape twice, no collect. At 100 TB swap the exact
    median for percentile_approx (B-27) — the code shape is unchanged."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    w = Window.partitionBy("event_type")
    dev = ev.join(med, "event_type").withColumn(
        "mad", F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).over(w)
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 4.4478 * F.col("mad")
    return dev.groupBy("event_type").agg(
        F.round(F.min("med"), 4).alias("med"),
        F.round(F.min("mad"), 4).alias("mad"),
        F.coalesce(F.sum(is_out.cast("long")), F.lit(0)).cast("long").alias("n_outliers"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# pipeline_domain_mixture — temperature-scaled source sampling weights
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH per_source AS (
  SELECT source,
         CAST(SUM(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
raw AS (
  SELECT source, n_tokens,
         pow(CAST(n_tokens AS DOUBLE)
             / (SELECT SUM(n_tokens) FROM per_source), 0.7) AS w
  FROM per_source
)
SELECT source, n_tokens,
       round(w / (SELECT SUM(w) FROM raw), 4) AS p_sample,
       CAST(round(1000000 * (w / (SELECT SUM(w) FROM raw)), 0) AS BIGINT)
         AS planned_tokens_1m,
       round(1000000 * (w / (SELECT SUM(w) FROM raw)) / n_tokens, 4)
         AS effective_epochs
FROM raw
"""


@query("pipeline_domain_mixture", oracle=_MIXTURE_ORACLE, survey_id="north-star")
def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing for pretraining-data assembly
    (the multilingual-sampling standard, p_i ∝ (n_i/N)^α with α=0.7):
    per-source token counts → raw temperature weights → normalized
    sampling probabilities, the planned token draw for a 1M-token
    budget, and the effective epochs each source would be cycled
    (planned/|source| — the over-sampling multiplier that α ramps up
    for small domains). This is the table a data-loader consumes to
    mix sources at training time.

    Scale shape: ONE keyed aggregate over the corpus (token counting is
    map-side partial); the normalization scalars (ΣN, Σw) are GLOBAL
    WINDOWS over the ~|sources|-row aggregate result, not crossJoins of
    derived 1-row aggregates — Catalyst re-expands a referenced subtree
    per consumer, so the crossJoin formulation costs FOUR corpus scans
    (measured, plan-audited r6) while the window formulation is one
    scan by construction. The window's single-partition exchange holds
    dozens of rows — free. Never a driver collect."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.lower(F.col("text")), " ")).cast("long"))
        .cast("long")
        .alias("n_tokens")
    )
    everything = Window.partitionBy()  # |sources| rows — a cheap global window
    raw = per_source.select(
        "source",
        "n_tokens",
        F.pow(
            F.col("n_tokens")
            / F.sum("n_tokens").over(everything).cast("double"),
            F.lit(0.7),
        ).alias("w"),
    )
    p = F.col("w") / F.sum("w").over(everything)
    return raw.select(
        "source",
        "n_tokens",
        F.round(p, 4).alias("p_sample"),
        F.round(p * 1_000_000, 0).cast("long").alias("planned_tokens_1m"),
        F.round(p * 1_000_000 / F.col("n_tokens"), 4).alias("effective_epochs"),
    )


# ---------------------------------------------------------------------------
# agg_psi_drift — population stability index between two time periods
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH bucketed AS (
  SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS period
  FROM events
),
counts AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE period = 'a') AS na,
         COUNT(*) FILTER (WHERE period = 'b') AS nb
  FROM bucketed GROUP BY bucket
),
tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM counts)
SELECT bucket,
       CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur,
       round((na + 1.0) / (ta + 10.0), 6) AS p_ref,
       round((nb + 1.0) / (tb + 10.0), 6) AS p_cur,
       round(((na + 1.0) / (ta + 10.0) - (nb + 1.0) / (tb + 10.0))
             * ln(((na + 1.0) / (ta + 10.0)) / ((nb + 1.0) / (tb + 10.0))), 6)
         AS psi_term
FROM counts CROSS JOIN tot
"""


@query("agg_psi_drift", oracle=_PSI_ORACLE, survey_id="B-25-ext")
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between a reference and a current
    period — the standard drift monitor a data/feature pipeline runs
    before trusting new data (PSI < 0.1 stable, > 0.25 action). Fixed
    width-50 value buckets (clamped to 10 bins — fixed edges, never
    data-dependent quantiles, so the bucketing is reproducible across
    runs and engines) and Laplace (+1) smoothing so empty bins
    contribute a finite, exact term in both engines.

    Scale shape: one pass, one keyed agg on (bucket) with the period
    split as conditional counts (map-side partial); the period totals
    are GLOBAL WINDOWS over the ≤10-row bucket frame (a crossJoin of a
    derived 1-row aggregate re-expands the subtree into a second full
    events scan — measured, plan-audited r6). PSI over 100 TB costs
    exactly one scan."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9))
    period_a = (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).cast("long")
    counts = e.select(bucket.alias("bucket"), period_a.alias("is_a")).groupBy(
        "bucket"
    ).agg(
        F.sum("is_a").alias("na"),
        (F.count(F.lit(1)) - F.sum("is_a")).alias("nb"),
    )
    everything = Window.partitionBy()  # ≤10 rows — a cheap global window
    ta, tb = F.sum("na").over(everything), F.sum("nb").over(everything)
    pa = (F.col("na") + 1.0) / (ta + 10.0)
    pb = (F.col("nb") + 1.0) / (tb + 10.0)
    return counts.select(
        "bucket",
        F.col("na").cast("long").alias("n_ref"),
        F.col("nb").cast("long").alias("n_cur"),
        F.round(pa, 6).alias("p_ref"),
        F.round(pb, 6).alias("p_cur"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# agg_ab_test_ztest — two-proportion experiment readout
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM users GROUP BY variant
),
w AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
         MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
         MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
         MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
  FROM v
)
SELECT n0, c0, n1, c1,
       round(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
       round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 4) AS z_score
FROM w
"""


@query("agg_ab_test_ztest", oracle=_AB_ORACLE, survey_id="B-25-ext")
def agg_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the standard A/B experiment readout
    (variant = user_id % 2, a deterministic hash split; conversion =
    any purchase event). Per-variant user and converter counts, rates,
    and the pooled-variance z-score, all in one result row.

    Scale shape: one keyed agg to (user, variant, converted) — the
    dedup-to-user step is the only shuffle that scales with data — then
    a 2-row variant rollup and scalar math. At 100 TB the z-test costs
    exactly the per-user dedup pass; everything after is constant. The
    pivot to one row goes through conditional MAX on a 2-row frame, not
    a collect."""
    e = table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("converted")
    )
    v = users.select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "converted"
    ).groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round(z, 4).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# events_ewma_hourly — exponentially weighted moving average smoothing
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, h, cents,
         array_agg(cents) OVER (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS xs
  FROM hourly
)
SELECT event_type, h, cents,
       round(list_reduce(list_transform(xs, x -> CAST(x AS DOUBLE)),
                         (acc, x) -> acc * 0.5 + x)
             / (2.0 * (1.0 - pow(0.5, len(xs)))), 4) AS ewma
FROM w
"""


@query("events_ewma_hourly", oracle=_EWMA_ORACLE, survey_id="B-31-ext")
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the hourly series —
    the time-series smoother monitoring dashboards run (α=0.5 decay,
    12-observation trailing frame, weights normalized by the closed-form
    Σ0.5^k so the series start is unbiased). EWMA's recursion is
    expressed as a HORNER FOLD over the frame's collected values
    (acc·α + x), which makes the float op sequence identical in both
    engines: Spark's ``aggregate`` with a 0.0 seed computes exactly
    DuckDB's ``list_reduce`` (whose first element IS the seed, since
    f(0, x₁) = x₁).

    Scale shape: ONE keyed agg to hourly grain (map-side partial — the
    only shuffle that scales with data), then a 12-row bounded window
    per type over the ~|types|×|hours| frame. State per window position
    is the 12-value array — O(frame), never O(history); the fold is
    codegen'd JVM. Window collect_list is frame-ordered (WindowExec
    processes rows in sort order), which the identical oracle pins."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(cents("value")).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-11, 0)
    xs = F.collect_list("cents").over(w)
    horner = F.aggregate(
        F.transform(xs, lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc * 0.5 + x,
    )
    denom = 2.0 * (1.0 - F.pow(F.lit(0.5), F.size(xs)))
    return hourly.select(
        "event_type",
        "h",
        "cents",
        F.round(horner / denom, 4).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# sample_shuffle_epoch — deterministic training-epoch shuffle (round 7)
# ---------------------------------------------------------------------------

_EPOCH_SHUFFLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id, source,
         md5(CAST(doc_id AS VARCHAR) || ':epoch=3') AS shuffle_key
  FROM documents
),
page AS (
  SELECT doc_id, source, shuffle_key
  FROM keyed ORDER BY shuffle_key, doc_id LIMIT 200
)
SELECT doc_id, source, shuffle_key,
       CAST((ascii(substr(shuffle_key, 1, 1)) * 256
             + ascii(substr(shuffle_key, 2, 1))) % 16 AS BIGINT) AS shard
FROM page
"""


@query("sample_shuffle_epoch", oracle=_EPOCH_SHUFFLE_ORACLE, survey_id="north-star")
def sample_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle — the data-loader's epoch
    ordering, computed as a PERMUTATION KEY instead of a materialized
    shuffle: ``md5(doc_id || ':epoch=N')`` is a seeded pseudorandom
    total order that any worker can recompute locally (md5 is the one
    hash both engines share bit-for-bit — SURVEY §5.3 rule 7, the B-55
    lesson; xxhash64 would be Tier R). Each epoch changes N → a fresh
    uncorrelated order with zero state carried between epochs.

    Scale shape: the loader never global-sorts 100 TB. Shard assignment
    is the first two hex nibbles of the same key (mod n_shards) — a
    map-side projection, one shuffle by shard to co-locate, ORDER BY
    shuffle_key WITHIN each shard's stream. The query returns the first
    200-row page of the global order (TakeOrderedAndProject: per-
    partition top-k then a 200-row driver merge — pagination without a
    distributed sort), with the shard column showing the worker routing.
    Tie-break doc_id per §5.3 rule 3 (md5 collisions are not assumed
    absent)."""
    d = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch=3")))
    keyed = d.select("doc_id", "source", key.alias("shuffle_key"))
    page = keyed.orderBy("shuffle_key", "doc_id").limit(200)
    shard = (
        (F.ascii(F.substring("shuffle_key", 1, 1)) * 256
         + F.ascii(F.substring("shuffle_key", 2, 1))) % 16
    ).cast("long")
    return page.select("doc_id", "source", "shuffle_key", shard.alias("shard"))


# ---------------------------------------------------------------------------
# pipeline_curriculum_order — quality-banded curriculum schedule (round 7)
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
), feat AS (
  SELECT doc_id,
         ((ascii(substr(md5(t), 1, 1)) * 256
           + ascii(substr(md5(t), 2, 1))) % 64) AS b
  FROM tok
), sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM((b * 37) % 13 - 6) AS BIGINT) AS wsum
  FROM feat GROUP BY doc_id
), banded AS (
  SELECT doc_id,
         CAST(CASE WHEN wsum > 0 THEN 0
                   WHEN wsum = 0 THEN 1 ELSE 2 END AS BIGINT) AS band,
         md5(CAST(doc_id AS VARCHAR) || ':epoch=3') AS k
  FROM sc
)
SELECT doc_id, band, k AS shuffle_key
FROM banded ORDER BY band, k, doc_id LIMIT 200
"""


@query("pipeline_curriculum_order", oracle=_CURRICULUM_ORACLE, survey_id="north-star")
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling — the loader ordering that composes two r7
    ops: documents are BANDED by the hashed-feature quality score
    (band 0 = net-positive weight sum first: high-quality-first
    curricula), and WITHIN each band the order is the deterministic
    per-epoch shuffle key, so every epoch re-shuffles inside bands while
    the band progression stays fixed. Scale shape: the band is one
    explode + keyed agg (the scorer's plan), the order key is a
    map-side md5 — the global schedule is never materialized; workers
    take (band, key-range) slices, and the demo page is
    TakeOrderedAndProject. Integer weight sums keep the banding exact
    on both engines."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    md5t = F.md5(F.col("t"))
    bucket = (
        F.ascii(F.substring(md5t, 1, 1)) * 256 + F.ascii(F.substring(md5t, 2, 1))
    ) % 64
    weight = (bucket * 37) % 13 - 6
    sc = tok.groupBy("doc_id").agg(F.sum(weight).cast("long").alias("wsum"))
    banded = sc.select(
        "doc_id",
        F.when(F.col("wsum") > 0, 0)
        .when(F.col("wsum") == 0, 1)
        .otherwise(2)
        .cast("long")
        .alias("band"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch=3"))).alias(
            "shuffle_key"
        ),
    )
    return banded.orderBy("band", "shuffle_key", "doc_id").limit(200).select(
        "doc_id", "band", "shuffle_key"
    )
