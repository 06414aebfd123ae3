"""Hypothesis-testing + data-selection operators (SURVEY.md §2.B
B-25-ext / B-31-ext / north-star, round 8).

The drift suite the engine already ships (PSI, two-proportion z-test,
EWMA — pipeline_ext.py) covers *monitoring*; this module adds the
*decision* statistics a data pipeline runs before promoting a new
corpus or feature slice:

- ``agg_ks_test`` — two-sample Kolmogorov–Smirnov (distribution shift).
- ``agg_mann_whitney`` — rank-sum test (median shift, tie-corrected).
- ``agg_chisq_independence`` — χ² independence over a contingency table.
- ``win_rolling_corr`` — 24 h rolling Pearson correlation of two series.
- ``events_autocorr_lag`` — lag-1..24 autocorrelation of the hourly rate.
- ``text_dsir_importance`` — DSIR-style importance weights for data
  selection (Xie et al. 2023: hashed n-gram features, target/raw
  log-likelihood ratio) — the scoring pass a pretraining pipeline runs
  to up-sample target-domain-like documents.
- ``text_readability_score`` — per-language readability from a
  vowel-group syllable heuristic (Flesch reading-ease form).
- ``agg_effect_size_cohens_d`` — standardized mean difference (wave 3).
- ``embed_covariance_matrix`` — distributed Gram/covariance via an
  Arrow kernel with exact integer partials (wave 3).
- ``text_ngram_novelty`` — per-batch novel-8-gram rate (wave 3).
- ``agg_permutation_test`` — md5-seeded label-permutation inference
  (wave 4).
- ``text_vocab_growth`` — Heaps'-law vocabulary growth curve (wave 4).
- ``events_seasonal_profile`` — dow×hour seasonal surface (wave 4).
- ``agg_winsorized_mean`` — robust mean via exact order statistics
  (wave 4).
- ``embed_power_iteration`` — dominant covariance eigenpair by three
  unrolled power steps, every fold ordered, certified against a
  declarative recursive-CTE-free SQL twin (wave 4).
- ``text_cross_lingual_overlap`` — pairwise vocabulary Jaccard across
  languages, the label-noise probe (wave 5).
- ``agg_quantile_bands_exact`` — per-group decile bands as integer-rank
  order statistics (wave 5).
- ``agg_t_test_welch`` — unequal-variance t + Welch–Satterthwaite df
  (wave 6).
- ``win_lag_features_matrix`` — lag/rolling feature materialization for
  forecasting (wave 6).
- ``embed_pairwise_distance_hist`` — embedding-collapse diagnostic on a
  hash sample, exact integer distances (wave 6).

Determinism (SURVEY §5.3): every statistic is assembled from EXACT
integer sums (counts, 2×average-ranks, Σt³−t tie terms, Σxy cross
moments) and converted to DOUBLE only in the final closed-form
expression, written with the identical operation sequence in the Spark
plan and the DuckDB oracle — so the floats match bit-for-bit before the
final ROUND. Per-doc float folds (DSIR) use the repo's ordered-fold
rule: Spark ``aggregate(sort_array(...), 0D, +)`` ≡ DuckDB
``list_reduce(array_agg(... ORDER BY ...), +)`` (seeded-vs-unseeded
left folds agree because f(0.0, x₁) = x₁ in IEEE).

Scale notes are per-op; the one structural caveat: KS and Mann–Whitney
are *global-order* statistics, so their exact forms end in a
single-partition prefix-sum/rank over the DISTINCT-value relation
(bounded by value cardinality, not row count — the heavy reduction to
per-value counts is a parallel keyed agg). At 100 TB with an unbounded
metric domain you bin first (KS over 10⁴ fixed bins differs from exact
by ≤ max bin mass) — exactly the PSI bucketing already in
pipeline_ext.py — or range-repartition + two-pass prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query


def exact_int_gram(x):
    """Exact XᵀX for an int64 matrix, BLAS-fast.

    numpy int64 matmul has no BLAS path (~360× slower than dgemm at
    batch shapes). When rows·qmax² < 2⁵³ every Gram entry is exactly
    representable in float64 and ONE dgemm suffices; otherwise the
    split-GEMM identity X = 2¹²A + B (A = X>>12 arithmetic, B = X&4095)
    gives XᵀX = 2²⁴AᵀA + 2¹²(AᵀB + (AᵀB)ᵀ) + BᵀB — three dgemms whose
    entries each stay below 2⁵³ for |x| < 2²⁴ (asserted), recombined in
    int64. Used by embed_covariance_matrix's Arrow kernel; unit-tested
    against the direct int64 matmul in tests/test_engine.py."""
    import numpy as np

    qmax = int(np.abs(x).max()) if x.size else 0
    # unconditional raises, not asserts: these are the exactness
    # contract ("fail loudly, not corrupt Gram partials") and must
    # survive `python -O` bytecode stripping (ADVICE r09 #3)
    if qmax >= (1 << 24):
        raise ValueError("split-GEMM exactness bound violated (|q| < 2^24)")
    if len(x) * qmax * qmax < (1 << 53):
        xf = x.astype(np.float64)
        return (xf.T @ xf).astype(np.int64)
    # Recombined split entries reach rows·qmax² (≤ rows·2^48): bound the
    # batch so the int64 shift-add cannot silently wrap if the Arrow
    # batch size is raised above the default (ADVICE r08 #2) — the
    # exactness contract must fail loudly, not corrupt Gram partials.
    if len(x) * qmax * qmax >= (1 << 63):
        raise ValueError(
            "split-GEMM int64 recombination bound (rows * qmax^2 < 2^63); "
            "lower spark.sql.execution.arrow.maxRecordsPerBatch"
        )
    a = (x >> 12).astype(np.float64)
    b = (x & 4095).astype(np.float64)
    g_hi = a.T @ a
    g_x = a.T @ b
    g_lo = b.T @ b
    return (
        (g_hi.astype(np.int64) << 24)
        + ((g_x + g_x.T).astype(np.int64) << 12)
        + g_lo.astype(np.int64)
    )

# ---------------------------------------------------------------------------
# agg_ks_test — two-sample Kolmogorov–Smirnov distance
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH s AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('click', 'purchase')
),
byv AS (
  SELECT value,
         COUNT(*) FILTER (WHERE event_type = 'click') AS na,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS nb
  FROM s GROUP BY value
),
c AS (
  SELECT SUM(na) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(nb) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(na) OVER () AS ta,
         SUM(nb) OVER () AS tb
  FROM byv
)
SELECT CAST(MAX(ta) AS BIGINT) AS n_click,
       CAST(MAX(tb) AS BIGINT) AS n_purchase,
       round(MAX(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)), 6)
         AS ks_stat,
       round(MAX(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb))
             * sqrt(CAST(MAX(ta) AS DOUBLE) * MAX(tb)
                    / (MAX(ta) + MAX(tb))), 4) AS ks_scaled
FROM c
"""


@query("agg_ks_test", oracle=_KS_ORACLE, survey_id="B-25-ext")
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the `click` and
    `purchase` value distributions: D = max_x |F̂_a(x) − F̂_b(x)|, plus
    the scaled statistic D·√(n_a·n_b/(n_a+n_b)) that the KS tables
    take. The ECDFs are exact: per-distinct-value conditional counts,
    then a running prefix sum ordered by value — every deviation
    candidate sits at an observed value, so the max over the grouped
    relation IS the exact D.

    Scale shape: the row-count-heavy work (filter + count per distinct
    value) is one parallel keyed agg; the prefix sum runs over the
    DISTINCT-value relation only. Exact KS is inherently a global
    order statistic — at 100 TB bin first (module docstring) or
    range-repartition the prefix sum. Both engines compute identical
    integer cumulative counts, so the double ratios and their max
    match bit-for-bit pre-round."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    byv = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("na"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("nb"),
    )
    run = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    glob = Window.partitionBy()
    c = byv.select(
        F.sum("na").over(run).alias("ca"),
        F.sum("nb").over(run).alias("cb"),
        F.sum("na").over(glob).alias("ta"),
        F.sum("nb").over(glob).alias("tb"),
    )
    d = F.abs(
        F.col("ca").cast("double") / F.col("ta")
        - F.col("cb").cast("double") / F.col("tb")
    )
    return c.agg(
        F.max("ta").cast("long").alias("n_click"),
        F.max("tb").cast("long").alias("n_purchase"),
        F.round(F.max(d), 6).alias("ks_stat"),
        F.round(
            F.max(d)
            * F.sqrt(
                F.max("ta").cast("double")
                * F.max("tb")
                / (F.max("ta") + F.max("tb"))
            ),
            4,
        ).alias("ks_scaled"),
    )


# ---------------------------------------------------------------------------
# agg_mann_whitney — rank-sum test with tie correction
# ---------------------------------------------------------------------------

_MW_ORACLE = """
WITH s AS (
  SELECT value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('click', 'purchase')
),
r AS (
  SELECT is_a,
         rank() OVER (ORDER BY value) AS rmin,
         COUNT(*) OVER (PARTITION BY value) AS cnt
  FROM s
),
t AS (
  SELECT SUM(CASE WHEN is_a = 1 THEN 2 * rmin + cnt - 1 ELSE 0 END) AS r2a,
         SUM(is_a) AS na,
         SUM(1 - is_a) AS nb
  FROM r
),
ties AS (
  SELECT SUM(cnt * cnt * cnt - cnt) AS tie_sum
  FROM (SELECT COUNT(*) AS cnt FROM s GROUP BY value) g
)
SELECT CAST(na AS BIGINT) AS n_click,
       CAST(nb AS BIGINT) AS n_purchase,
       round(CAST(r2a AS DOUBLE) / 2
             - CAST(na AS DOUBLE) * (na + 1) / 2, 4) + 0.0 AS u_stat,
       round((CAST(r2a AS DOUBLE) / 2
              - CAST(na AS DOUBLE) * (na + 1) / 2
              - CAST(na AS DOUBLE) * nb / 2)
             / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                    * ((na + nb + 1)
                       - CAST(tie_sum AS DOUBLE)
                         / ((na + nb) * (na + nb - 1.0)))), 4) + 0.0
         AS z_score
FROM t CROSS JOIN ties
"""


@query("agg_mann_whitney", oracle=_MW_ORACLE, survey_id="B-25-ext")
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the `click` and
    `purchase` value samples, with the standard tie-corrected normal
    approximation. Average ranks for ties are kept EXACT by summing
    2·rank_avg = 2·rank_min + cnt − 1 as a BIGINT (never a float sum
    of x.5 ranks); the tie term Σ(t³−t) is likewise integral. U and z
    are then single closed-form double expressions — identical op
    sequence in the oracle, so pre-round floats match bit-for-bit.

    Scale shape: same as KS — the per-row work collapses into ranks
    over values; exact global ranks are a single-partition sort of the
    sample (bin or range-partition at 100 TB, module docstring)."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = e.select(
        "value", (F.col("event_type") == "click").cast("long").alias("is_a")
    )
    r = s.select(
        "is_a",
        F.rank().over(Window.orderBy("value")).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("value")).alias("cnt"),
    )
    t = r.agg(
        F.sum(
            F.when(
                F.col("is_a") == 1, 2 * F.col("rmin") + F.col("cnt") - 1
            ).otherwise(F.lit(0))
        ).alias("r2a"),
        F.sum("is_a").alias("na"),
        F.sum(1 - F.col("is_a")).alias("nb"),
    )
    ties = (
        s.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ).alias("tie_sum")
        )
    )
    na, nb = F.col("na"), F.col("nb")
    ra = F.col("r2a").cast("double") / 2
    u = ra - na.cast("double") * (na + 1) / 2
    n = na + nb
    sigma = F.sqrt(
        na.cast("double") * nb / 12.0
        * ((n + 1) - F.col("tie_sum").cast("double") / (n * (n - 1.0)))
    )
    return t.crossJoin(ties).select(
        na.cast("long").alias("n_click"),
        nb.cast("long").alias("n_purchase"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (F.round(u, 4) + F.lit(0.0)).alias("u_stat"),
        (
            F.round((u - na.cast("double") * nb / 2) / sigma, 4) + F.lit(0.0)
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# agg_chisq_independence — χ² contingency table (lang × source)
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_obs FROM documents GROUP BY lang, source
),
e AS (
  SELECT lang, source, n_obs,
         SUM(n_obs) OVER (PARTITION BY lang) AS row_tot,
         SUM(n_obs) OVER (PARTITION BY source) AS col_tot,
         SUM(n_obs) OVER () AS n_tot
  FROM cells
)
SELECT lang, source, CAST(n_obs AS BIGINT) AS n_obs,
       round(CAST(row_tot AS DOUBLE) * col_tot / n_tot, 6) AS expected,
       round((n_obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
             * (n_obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
             / (CAST(row_tot AS DOUBLE) * col_tot / n_tot), 6) AS chi2_term
FROM e
"""


@query("agg_chisq_independence", oracle=_CHISQ_ORACLE, survey_id="B-25-ext")
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence between document language and source —
    the per-CELL decision table (observed, expected under independence,
    χ² contribution), not just the summed statistic, so a reviewer can
    see *which* (lang, source) cell drives the dependence. Σchi2_term
    over the result is the test statistic with (|lang|−1)(|source|−1)
    degrees of freedom.

    Scale shape: one keyed agg collapses N rows to ≤ |lang|·|source|
    cells; the marginals are windows over that tiny cell relation (the
    repo's single-scan normalization discipline — never a crossJoin of
    derived aggregates, SCALE.md r6). At 100 TB the χ² costs exactly
    one scan."""
    cells = (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    row_tot = F.sum("n_obs").over(Window.partitionBy("lang"))
    col_tot = F.sum("n_obs").over(Window.partitionBy("source"))
    n_tot = F.sum("n_obs").over(Window.partitionBy())
    expected = row_tot.cast("double") * col_tot / n_tot
    return cells.select(
        "lang",
        "source",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected,
            6,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# win_rolling_corr — 24 h rolling Pearson correlation of two series
# ---------------------------------------------------------------------------

_ROLLCORR_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         COUNT(*) FILTER (WHERE event_type = 'click') AS x,
         COUNT(*) FILTER (WHERE event_type = 'view') AS y
  FROM events GROUP BY 1
),
w AS (
  SELECT h, x, y,
         COUNT(*)   OVER fr AS n,
         SUM(x)     OVER fr AS sx,
         SUM(y)     OVER fr AS sy,
         SUM(x * y) OVER fr AS sxy,
         SUM(x * x) OVER fr AS sx2,
         SUM(y * y) OVER fr AS sy2
  FROM hourly
  WINDOW fr AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT h, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       round((n * sxy - sx * sy)
             / NULLIF(sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)), 0.0), 6)
         + 0.0 AS corr24
FROM w
"""


@query("win_rolling_corr", oracle=_ROLLCORR_ORACLE, survey_id="B-31-ext")
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour Pearson correlation between the hourly `click`
    and `view` rates — the co-movement monitor behind "did these two
    signals decouple?" alerts. Pearson is NOT computed with the
    engines' streaming `corr` aggregate (whose update order differs
    across engines); it is assembled from the six EXACT integer frame
    sums (n, Σx, Σy, Σxy, Σx², Σy²) and one closed-form double
    expression, NULL when either side has zero variance in the frame
    (NULLIF guard in both engines).

    Scale shape: the events scan collapses to one row per hour
    (parallel keyed agg with map-side partials); the rolling frame
    runs over the hourly relation — 8,760 rows/year regardless of raw
    volume. Partition by series/tenant at scale for a parallel
    window."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("y"),
    )
    fr = Window.orderBy("h").rowsBetween(-23, 0)
    n = F.count(F.lit(1)).over(fr)
    sx = F.sum("x").over(fr)
    sy = F.sum("y").over(fr)
    sxy = F.sum(F.col("x") * F.col("y")).over(fr)
    sx2 = F.sum(F.col("x") * F.col("x")).over(fr)
    sy2 = F.sum(F.col("y") * F.col("y")).over(fr)
    denom = F.sqrt((n * sx2 - sx * sx).cast("double")) * F.sqrt(
        (n * sy2 - sy * sy).cast("double")
    )
    return hourly.select(
        "h",
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (
            F.round((n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0)), 6)
            + F.lit(0.0)
        ).alias("corr24"),
    )


# ---------------------------------------------------------------------------
# events_autocorr_lag — lag-1..24 autocorrelation of the hourly rate
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS hour_id,
         COUNT(*) AS c
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(1, 25)) AS lag_h),
pairs AS (
  SELECT l.lag_h, a.c AS x, b.c AS y
  FROM hourly a
  CROSS JOIN lags l
  JOIN hourly b ON b.hour_id = a.hour_id - l.lag_h
),
m AS (
  SELECT lag_h, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM pairs GROUP BY lag_h
)
SELECT CAST(lag_h AS BIGINT) AS lag_h, CAST(n AS BIGINT) AS n_pairs,
       round((n * sxy - sx * sy)
             / NULLIF(sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)), 0.0), 6)
         + 0.0 AS autocorr
FROM m
ORDER BY lag_h
"""


@query("events_autocorr_lag", oracle=_AUTOCORR_ORACLE, survey_id="B-31-ext")
def events_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event rate at lags 1..24 — the
    seasonality probe (a daily cycle shows as a lag-24 peak). The
    hourly series is keyed by integer hour_id = epoch/3600 so the lag
    pairing is an exact equi-join (never a timestamp-interval join);
    Pearson per lag is assembled from exact integer sums like
    win_rolling_corr.

    Scale shape: raw events collapse to one row per hour first (the
    only data-sized shuffle); the ×24 lag explode and self-join run on
    the hourly relation (8,760 rows/year), keyed by hour_id — bounded
    work regardless of raw volume."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            (
                F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600
            )
            .cast("long")
            .alias("hour_id")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = hourly.select(
        "hour_id",
        F.col("c").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(24))).alias("lag_h"),
    )
    pairs = probes.join(
        hourly.select(
            F.col("hour_id").alias("rhs_id"), F.col("c").alias("y")
        ),
        F.col("rhs_id") == F.col("hour_id") - F.col("lag_h"),
    )
    m = pairs.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    denom = F.sqrt((n * F.col("sx2") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("sy2") - sy * sy).cast("double")
    )
    return (
        m.select(
            F.col("lag_h").cast("long").alias("lag_h"),
            n.cast("long").alias("n_pairs"),
            # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
            (
                F.round(
                    (n * F.col("sxy") - sx * sy)
                    / F.nullif(denom, F.lit(0.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("autocorr"),
        )
        .orderBy("lag_h")
    )


# ---------------------------------------------------------------------------
# text_dsir_importance — DSIR-style data-selection importance weights
# ---------------------------------------------------------------------------

_DSIR_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
tb AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(w), 1, 4) AS BIGINT) % 256 AS b
  FROM tok
),
bucket_stats AS (
  SELECT b,
         COUNT(*) FILTER (WHERE lang = 'en') AS nt,
         COUNT(*) AS nr
  FROM tb GROUP BY b
),
tot AS (SELECT SUM(nt) AS tt, SUM(nr) AS tr FROM bucket_stats),
ratios AS (
  SELECT b,
         ln((nt + 1.0) / (tt + 256.0)) - ln((nr + 1.0) / (tr + 256.0)) AS lr
  FROM bucket_stats CROSS JOIN tot
),
dc AS (SELECT doc_id, b, COUNT(*) AS cnt FROM tb GROUP BY doc_id, b),
terms AS (
  SELECT d.doc_id,
         array_agg(d.cnt * r.lr ORDER BY d.b) AS terms,
         SUM(d.cnt) AS n_tokens
  FROM dc d JOIN ratios r ON d.b = r.b
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(list_reduce(terms, (acc, x) -> acc + x), 6) AS dsir_score
FROM terms
ORDER BY dsir_score DESC, doc_id
LIMIT 100
"""


@query("text_dsir_importance", oracle=_DSIR_ORACLE, survey_id="north-star")
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scores for training-data selection (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): hashed unigram buckets (md5-prefix % 256 — the
    cross-engine hash, SURVEY §5.3 rule 7), a Laplace-smoothed
    target-vs-raw log-likelihood ratio per bucket (target = `en`
    documents standing in for the high-quality domain), and per-doc
    score Σ_b count_b · log(p_target(b)/p_raw(b)). Top-100 docs by
    score (doc_id tiebreak) — the ranking a pipeline feeds into
    importance resampling.

    Float determinism: the per-doc sum is an ORDERED fold — Spark
    ``aggregate(sort_array(struct(b, term)), 0D, +)`` ≡ DuckDB
    ``list_reduce(array_agg(term ORDER BY b), +)`` (f(0,x₁)=x₁) — so
    both engines add the same doubles in the same order.

    Scale shape: two keyed aggs over the token explode (bucket stats:
    256 rows; per-doc bucket counts: ≤256/doc) and a BROADCAST join of
    the 256-row ratio table — no shuffle grows beyond the doc-bucket
    relation. The top-100 is TakeOrdered, never a global sort."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    tb = tok.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
            % 256
        ).alias("b"),
    )
    bucket_stats = tb.groupBy("b").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("nt"),
        F.count(F.lit(1)).alias("nr"),
    )
    glob = Window.partitionBy()
    tt = F.sum("nt").over(glob)
    tr = F.sum("nr").over(glob)
    ratios = bucket_stats.select(
        "b",
        (
            F.log((F.col("nt") + 1.0) / (tt + 256.0))
            - F.log((F.col("nr") + 1.0) / (tr + 256.0))
        ).alias("lr"),
    )
    dc = tb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cnt"))
    terms = (
        dc.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("b"), (F.col("cnt") * F.col("lr")).alias("term")))
            ).alias("terms"),
            F.sum("cnt").alias("n_tokens"),
        )
    )
    return (
        terms.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.aggregate(
                    F.transform(F.col("terms"), lambda s: s["term"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# text_readability_score — vowel-group syllable heuristic, per language
# ---------------------------------------------------------------------------

_READABILITY_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
syl AS (
  SELECT doc_id, lang,
         greatest(len(regexp_extract_all(w, '[aeiou]+')), 1) AS s
  FROM tok
),
per_lang AS (
  SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_words,
         SUM(s) AS n_syllables
  FROM syl GROUP BY lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(CAST(n_syllables AS DOUBLE) / n_words, 6) AS syllables_per_word,
       round(206.835 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
         AS reading_ease
FROM per_lang
"""


@query("text_readability_score", oracle=_READABILITY_ORACLE, survey_id="north-star")
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language readability from the Flesch reading-ease form,
    206.835 − 84.6·(syllables/word), with syllables estimated as
    vowel-group runs (`[aeiou]+` matches; vowel-less words — e.g. the
    zh corpus — floor at 1). The corpus text is unpunctuated
    (FIXTURES.md), so the words-per-sentence term is structurally 0 and
    is dropped — documented, not hidden. Complements
    text_filter_quality (per-doc gates) with a corpus-level readability
    profile.

    Scale shape: explode → one keyed agg with integer partials
    (COUNT DISTINCT doc_id is the only expensive modifier; at 100 TB
    swap for approx_count_distinct or pre-agg per (lang, doc)). Float
    math happens once per language row."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    syl = tok.select(
        "doc_id",
        "lang",
        F.greatest(
            F.size(F.regexp_extract_all("w", F.lit("[aeiou]+"), 0)), F.lit(1)
        ).alias("s"),
    )
    per_lang = syl.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("s").alias("n_syllables"),
    )
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return per_lang.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.round(206.835 - 84.6 * spw, 4).alias("reading_ease"),
    )


# ---------------------------------------------------------------------------
# agg_effect_size_cohens_d — standardized mean difference (magnitude
# companion to the z-test / Mann-Whitney significance readouts)
# ---------------------------------------------------------------------------

_COHENS_D_ORACLE = """
WITH s AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT is_a, COUNT(*) AS n, SUM(cents) AS sc, SUM(cents * cents) AS sc2
  FROM s GROUP BY is_a
),
w AS (
  SELECT MAX(CASE WHEN is_a = 1 THEN n END) AS na,
         MAX(CASE WHEN is_a = 1 THEN sc END) AS sa,
         MAX(CASE WHEN is_a = 1 THEN sc2 END) AS sa2,
         MAX(CASE WHEN is_a = 0 THEN n END) AS nb,
         MAX(CASE WHEN is_a = 0 THEN sc END) AS sb,
         MAX(CASE WHEN is_a = 0 THEN sc2 END) AS sb2
  FROM g
)
SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_purchase,
       round(CAST(sa AS DOUBLE) / na / 100, 4) AS mean_click,
       round(CAST(sb AS DOUBLE) / nb / 100, 4) AS mean_purchase,
       round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
             / sqrt(((CAST(sa2 AS DOUBLE)
                      - CAST(sa AS DOUBLE) * sa / na)
                     + (CAST(sb2 AS DOUBLE)
                        - CAST(sb AS DOUBLE) * sb / nb))
                    / (na + nb - 2)), 4) + 0.0 AS cohens_d
FROM w
"""


@query("agg_effect_size_cohens_d", oracle=_COHENS_D_ORACLE, survey_id="B-25-ext")
def agg_effect_size_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the `click` and `purchase` value samples — the
    effect-SIZE companion to the suite's significance tests (a z-score
    says "real", d says "big enough to care"). Values are scaled to
    integer cents first (the repo's EWMA precedent) so n, Σx, Σx² are
    EXACT BIGINTs; the pooled-SD formula is one closed-form double
    expression mirrored textually in the oracle. d is scale-invariant,
    so the cents scaling cancels; means are reported back in dollars.

    Scale shape: one keyed agg with integer map-side partials, then a
    2-row conditional-MAX pivot — identical cost profile to
    agg_ab_test_ztest (one scan at any volume)."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = e.select(
        (F.col("event_type") == "click").cast("long").alias("is_a"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    g = s.groupBy("is_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("cents") * F.col("cents")).alias("sc2"),
    )
    w = g.agg(
        F.max(F.when(F.col("is_a") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("is_a") == 1, F.col("sc"))).alias("sa"),
        F.max(F.when(F.col("is_a") == 1, F.col("sc2"))).alias("sa2"),
        F.max(F.when(F.col("is_a") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("is_a") == 0, F.col("sc"))).alias("sb"),
        F.max(F.when(F.col("is_a") == 0, F.col("sc2"))).alias("sb2"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    ssa = F.col("sa2").cast("double") - sa.cast("double") * sa / na
    ssb = F.col("sb2").cast("double") - sb.cast("double") * sb / nb
    pooled = F.sqrt((ssa + ssb) / (na + nb - 2))
    return w.select(
        na.cast("long").alias("n_click"),
        nb.cast("long").alias("n_purchase"),
        F.round(sa.cast("double") / na / 100, 4).alias("mean_click"),
        F.round(sb.cast("double") / nb / 100, 4).alias("mean_purchase"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (
            F.round(
                (sa.cast("double") / na - sb.cast("double") / nb) / pooled, 4
            )
            + F.lit(0.0)
        ).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# embed_covariance_matrix — distributed Gram/covariance over embeddings
# ---------------------------------------------------------------------------

_COV_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS qe
  FROM embeddings
),
idx AS (SELECT unnest(range(0, 64)) AS i),
pairs AS (
  SELECT a.i AS i, b.i AS j, q.qe[a.i + 1] AS qi, q.qe[b.i + 1] AS qj
  FROM q, idx a, idx b WHERE a.i <= b.i
),
m AS (
  SELECT i, j, COUNT(*) AS n, SUM(qi) AS s_i, SUM(qj) AS s_j,
         SUM(qi * qj) AS s_ij
  FROM pairs GROUP BY i, j
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(n AS BIGINT) AS n,
       round((CAST(s_ij AS DOUBLE) - CAST(s_i AS DOUBLE) * s_j / n)
             / (n - 1) / 1000000000000.0, 6) + 0.0 AS cov
FROM m
ORDER BY i, j
"""


@query("embed_covariance_matrix", oracle=_COV_ORACLE, survey_id="north-star")
def embed_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix of the 64-dim embedding column —
    the precursor to whitening / PCA / ZCA that embedding pipelines run
    before indexing (the 64×64 eigendecomposition itself is driver-side
    numpy on the RESULT; computing the Gram matrix over all vectors is
    the distributed part). Vectors are scaled to exact integer
    micro-units in the JVM (round(x·1e6) — float32 widened to double
    first, so both engines round the same double), then an Arrow
    ``mapInPandas`` kernel computes per-batch int64 Gram partials
    (numpy ``X.T @ X`` — exact integer matmul) and one keyed agg sums
    them: the classic map-side-combine outer-product aggregation, the
    ONLY shape that survives 100 TB (shuffle size is 2,080 rows per
    task, independent of data volume).

    Tier H: integer partial sums are order-insensitive, so the Arrow
    kernel's totals equal DuckDB's unnest-join twin exactly; the final
    covariance is one mirrored double expression.

    Kernel: numpy has no BLAS path for int64 matmul (measured 360×
    slower than dgemm at this shape), so each batch's exact Gram is
    computed by the split-GEMM identity — q = (q>>12)·2¹² + (q&4095),
    X = 2¹²A + B, XᵀX = 2²⁴AᵀA + 2¹²(AᵀB + (AᵀB)ᵀ) + BᵀB — three
    float64 dgemms whose entries stay exact integers (each bounded by
    batch_rows·2²⁴ < 2⁵³ for |q| < 2²⁴, i.e. |x| < 16.7; asserted),
    recombined in int64. Cross-batch accumulation is DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB SUM(BIGINT)) so the totals never
    overflow at any corpus size; they convert to double once, in the
    identical final expression.

    Cites: operators/similarity.py sim_search_arrow_kernel (the repo's
    Arrow-batch precedent); SURVEY §4.2 UDF rules."""
    import numpy as np
    import pyarrow as pa

    dim = 64
    emb = table(spark, sf_dir, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000.0, 0).cast("long"),
        ).alias("qe")
    )

    iu = np.triu_indices(dim)
    out_schema = pa.schema(
        [(c, pa.int64()) for c in ("i", "j", "n", "s_i", "s_j", "s_ij")]
    )

    def gram_partials(batches):
        # mapInArrow: the list<int64> column arrives as one flat int64
        # values buffer — reshape is zero-copy, no per-row Python objects
        for rb in batches:
            if rb.num_rows == 0:
                continue
            col = rb.column(0)
            x = col.flatten().to_numpy(zero_copy_only=False).reshape(
                rb.num_rows, dim
            )
            g = exact_int_gram(x)
            s = x.sum(axis=0)  # exact int64 column sums
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu[0].astype(np.int64)),
                    pa.array(iu[1].astype(np.int64)),
                    pa.array(np.full(len(iu[0]), len(x), dtype=np.int64)),
                    pa.array(s[iu[0]]),
                    pa.array(s[iu[1]]),
                    pa.array(g[iu]),
                ],
                schema=out_schema,
            )

    partials = emb.mapInArrow(
        gram_partials, "i long, j long, n long, s_i long, s_j long, s_ij long"
    )
    dec = "decimal(38,0)"
    m = partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum(F.col("s_i").cast(dec)).cast("double").alias("s_i"),
        F.sum(F.col("s_j").cast(dec)).cast("double").alias("s_j"),
        F.sum(F.col("s_ij").cast(dec)).cast("double").alias("s_ij"),
    )
    n = F.col("n")
    cov = (
        (F.col("s_ij").cast("double") - F.col("s_i").cast("double") * F.col("s_j") / n)
        / (n - 1)
        / 1000000000000.0
    )
    # `+ 0.0` normalizes IEEE signed zero: DuckDB's round() preserves -0.0
    # (e.g. cell i=5,j=9 at sf0.01) while Spark's never emits it — value-
    # equal, hash-different under the driver's value-hash (SURVEY §5.3
    # rule 8). -0.0 + 0.0 = +0.0 in both engines.
    return m.select(
        "i", "j", n.alias("n"), (F.round(cov, 6) + F.lit(0.0)).alias("cov")
    ).orderBy("i", "j")


# ---------------------------------------------------------------------------
# text_ngram_novelty — per-ingestion-batch novel 8-gram rate
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH w AS (
  SELECT DISTINCT doc_id // 500 AS batch_id, h
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(string_split(text, ' ')) - 7),
             k -> md5(array_to_string(
                    string_split(text, ' ')[k + 1:k + 8], ' ')))) AS h
    FROM documents
  ) x
),
firsts AS (SELECT h, MIN(batch_id) AS fb FROM w GROUP BY h),
per_batch AS (
  SELECT batch_id, COUNT(*) AS n_windows FROM w GROUP BY batch_id
),
novel AS (SELECT fb AS batch_id, COUNT(*) AS n_novel FROM firsts GROUP BY fb)
SELECT CAST(p.batch_id AS BIGINT) AS batch_id,
       CAST(p.n_windows AS BIGINT) AS n_windows,
       CAST(n.n_novel AS BIGINT) AS n_novel,
       round(CAST(n.n_novel AS DOUBLE) / p.n_windows, 6) AS novelty_rate
FROM per_batch p JOIN novel n ON n.batch_id = p.batch_id
ORDER BY batch_id
"""


@query("text_ngram_novelty", oracle=_NOVELTY_ORACLE, survey_id="north-star")
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novel-8-gram rate per ingestion batch (batch = doc_id div 500) —
    the corpus-growth freshness curve a data-curation team watches: as
    a crawl matures, the fraction of never-before-seen 8-grams per
    batch decays, and a batch whose novelty snaps back up signals a
    new domain (or an upstream dedup failure). Windows are md5-hashed
    8-token slices (cross-engine hash), novelty = windows whose global
    MIN(batch) is this batch over the batch's DISTINCT windows.

    Scale shape: ONE documents scan — explode → DISTINCT (batch, hash)
    → first-seen via `min(batch) OVER (PARTITION BY hash)` → one keyed
    agg by batch (the crossdoc window-over-hash-partition skeleton,
    operators/text.py). The naive two-consumer form (separate
    firsts/per-batch aggs over the shared distinct relation) re-inlines
    the explode subtree and scans documents twice — plan-asserted down
    to one scan in tests/test_plans.py. Hash keys are uniform (md5);
    never batch×batch."""
    docs = table(spark, sf_dir, "documents")
    w = (
        docs.select(
            (F.col("doc_id") / 500).cast("long").alias("batch_id"),
            # Let-binding idiom (r11, same fix as dedup._shingles): bind
            # the token array once per row; the unbound form re-split the
            # whole text once per 8-token window inside the lambda.
            F.explode(
                F.expr(
                    """
                    transform(array(split(text, ' ')), ws ->
                      CASE WHEN size(ws) >= 8
                           THEN transform(
                                  sequence(0, size(ws) - 8),
                                  k -> md5(concat_ws(' ', slice(ws, k + 1, 8))))
                           ELSE array()
                      END)[0]
                    """
                )
            ).alias("h"),
        )
        .distinct()
    )
    fb = F.min("batch_id").over(Window.partitionBy("h"))
    return (
        w.withColumn("fb", fb)
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(
                (F.col("fb") == F.col("batch_id")).cast("long")
            ).alias("n_novel"),
        )
        .where(F.col("n_novel") > 0)
        .select(
            F.col("batch_id").cast("long").alias("batch_id"),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(
                F.col("n_novel").cast("double") / F.col("n_windows"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("batch_id")
    )


# ---------------------------------------------------------------------------
# agg_permutation_test — exact nonparametric inference via seeded label
# permutations (wave 4)
# ---------------------------------------------------------------------------

_PERM_K = 100

_PERM_ORACLE = f"""
WITH s AS (
  SELECT event_id,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
obs AS (
  SELECT SUM(CASE WHEN is_a = 1 THEN cents ELSE 0 END) AS sa,
         SUM(is_a) AS na,
         SUM(CASE WHEN is_a = 0 THEN cents ELSE 0 END) AS sb,
         SUM(1 - is_a) AS nb
  FROM s
),
perms AS (
  SELECT p.p,
         CAST('0x' || substr(md5(s.event_id || '#' || p.p), 1, 4) AS BIGINT)
           % 2 AS flip,
         s.cents
  FROM s CROSS JOIN (SELECT unnest(range(0, {_PERM_K})) AS p) p
),
pstat AS (
  SELECT p,
         CAST(SUM(CASE WHEN flip = 1 THEN cents ELSE 0 END) AS DOUBLE)
           / NULLIF(SUM(flip), 0)
         - CAST(SUM(CASE WHEN flip = 0 THEN cents ELSE 0 END) AS DOUBLE)
           / NULLIF(SUM(1 - flip), 0) AS stat
  FROM perms GROUP BY p
),
agg AS (
  SELECT COUNT(*) AS n_perms,
         SUM(CASE WHEN abs(pstat.stat) >=
               abs(CAST(o.sa AS DOUBLE) / o.na - CAST(o.sb AS DOUBLE) / o.nb)
             THEN 1 ELSE 0 END) AS n_extreme
  FROM pstat CROSS JOIN obs o
)
SELECT CAST(o.na AS BIGINT) AS n_click, CAST(o.nb AS BIGINT) AS n_purchase,
       round((CAST(o.sa AS DOUBLE) / o.na - CAST(o.sb AS DOUBLE) / o.nb)
             / 100, 4) + 0.0 AS obs_diff,
       CAST(a.n_perms AS BIGINT) AS n_perms,
       CAST(a.n_extreme AS BIGINT) AS n_extreme,
       round((1.0 + a.n_extreme) / (a.n_perms + 1.0), 4) AS p_value
FROM obs o CROSS JOIN agg a
"""


@query("agg_permutation_test", oracle=_PERM_ORACLE, survey_id="B-25-ext")
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the click-vs-purchase mean difference — the
    assumption-free companion to the parametric z/U tests: re-label
    every row under K=100 DETERMINISTIC pseudo-random permutations
    (flip = md5(event_id # p) parity — the cross-engine hash, so both
    engines draw the SAME permutations), recompute the mean difference
    per permutation, and report the add-one-smoothed two-sided p-value.
    Statistics are built from exact integer cents sums; the extreme
    comparison |stat_p| ≥ |obs| compares doubles both engines derived
    from identical integers through identical expressions.

    Scale shape: the ×K explode is K scans' worth of COMPUTE in ONE
    scan and one keyed agg to 2K groups (map-side partials do the
    heavy lifting); nothing downstream scales with rows. At 100 TB,
    permutation inference costs K× the map CPU of a mean — shuffle
    stays 2K rows — which is exactly how you'd run it on a cluster."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = e.select(
        "event_id",
        (F.col("event_type") == "click").cast("long").alias("is_a"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    obs = s.agg(
        F.sum(F.when(F.col("is_a") == 1, F.col("cents")).otherwise(0)).alias("sa"),
        F.sum("is_a").alias("na"),
        F.sum(F.when(F.col("is_a") == 0, F.col("cents")).otherwise(0)).alias("sb"),
        F.sum(1 - F.col("is_a")).alias("nb"),
    )
    perms = s.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_K - 1))).alias("p"),
    ).select(
        "p",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#"), F.col("p").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("flip"),
        "cents",
    )
    pstat = perms.groupBy("p").agg(
        (
            F.sum(F.when(F.col("flip") == 1, F.col("cents")).otherwise(0)).cast("double")
            / F.nullif(F.sum("flip"), F.lit(0))
            - F.sum(F.when(F.col("flip") == 0, F.col("cents")).otherwise(0)).cast("double")
            / F.nullif(F.sum(1 - F.col("flip")), F.lit(0))
        ).alias("stat")
    )
    obs_diff = (
        F.col("sa").cast("double") / F.col("na")
        - F.col("sb").cast("double") / F.col("nb")
    )
    agg = pstat.crossJoin(obs).agg(
        F.count(F.lit(1)).alias("n_perms"),
        F.sum(
            F.when(F.abs(F.col("stat")) >= F.abs(obs_diff), 1).otherwise(0)
        ).alias("n_extreme"),
    )
    return obs.crossJoin(agg).select(
        F.col("na").cast("long").alias("n_click"),
        F.col("nb").cast("long").alias("n_purchase"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (F.round(obs_diff / 100, 4) + F.lit(0.0)).alias("obs_diff"),
        F.col("n_perms").cast("long").alias("n_perms"),
        F.col("n_extreme").cast("long").alias("n_extreme"),
        F.round(
            (1.0 + F.col("n_extreme")) / (F.col("n_perms") + 1.0), 4
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# text_vocab_growth — Heaps'-law vocabulary growth curve (wave 4)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH tok AS (
  SELECT doc_id // 500 AS batch_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
per_batch AS (
  SELECT batch_id, COUNT(*) AS batch_tokens FROM tok GROUP BY batch_id
),
firsts AS (
  SELECT w, MIN(batch_id) AS fb FROM tok GROUP BY w
),
new_types AS (SELECT fb AS batch_id, COUNT(*) AS new_types FROM firsts GROUP BY fb),
curve AS (
  SELECT p.batch_id, p.batch_tokens, COALESCE(n.new_types, 0) AS new_types,
         SUM(p.batch_tokens) OVER (ORDER BY p.batch_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
         SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY p.batch_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
  FROM per_batch p LEFT JOIN new_types n ON n.batch_id = p.batch_id
)
SELECT CAST(batch_id AS BIGINT) AS batch_id,
       CAST(batch_tokens AS BIGINT) AS batch_tokens,
       CAST(new_types AS BIGINT) AS new_types,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_vocab AS BIGINT) AS cum_vocab,
       round(CAST(cum_vocab AS DOUBLE) / cum_tokens, 6) AS type_token_ratio
FROM curve
ORDER BY batch_id
"""


@query("text_vocab_growth", oracle=_VOCAB_ORACLE, survey_id="north-star")
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve per ingestion batch (batch =
    doc_id div 500): tokens added, never-seen-before types added,
    cumulative totals, and the type-token ratio — the standard "is the
    corpus still adding vocabulary or just repeating itself" curve
    next to text_ngram_novelty's 8-gram view. All counts are exact
    integers; the only float is the final ratio.

    Scale shape: one token explode → two keyed aggs (per-batch counts;
    MIN(batch) per distinct type — vocabulary-bounded, not
    token-bounded) → prefix sums over the |batches|-row curve. The
    word-keyed agg is the crossdoc-style uniform heavy shuffle."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") / 500).cast("long").alias("batch_id"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    per_batch = tok.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("batch_tokens")
    )
    new_types = (
        tok.groupBy("w")
        .agg(F.min("batch_id").alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    run = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_batch.join(new_types, "batch_id", "left")
        .select(
            "batch_id",
            "batch_tokens",
            F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
        )
        .select(
            "batch_id",
            "batch_tokens",
            "new_types",
            F.sum("batch_tokens").over(run).alias("cum_tokens"),
            F.sum("new_types").over(run).alias("cum_vocab"),
        )
    )
    return curve.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.col("batch_tokens").cast("long").alias("batch_tokens"),
        F.col("new_types").cast("long").alias("new_types"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
        F.round(
            F.col("cum_vocab").cast("double") / F.col("cum_tokens"), 6
        ).alias("type_token_ratio"),
    ).orderBy("batch_id")


# ---------------------------------------------------------------------------
# events_seasonal_profile — day-of-week × hour-of-day seasonal surface
# (wave 4)
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH cells AS (
  SELECT CAST((CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 + 4)
              % 7 AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         COUNT(*) AS n,
         SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT dow, hod, n, cents,
         SUM(n) OVER () AS tot_n, SUM(cents) OVER () AS tot_cents
  FROM cells
)
SELECT dow, hod, CAST(n AS BIGINT) AS n,
       round(CAST(cents AS DOUBLE) / n / 100, 4) AS mean_value,
       round(CAST(cents AS DOUBLE) / n / 100
             - CAST(tot_cents AS DOUBLE) / tot_n / 100, 4) + 0.0
         AS dev_from_global
FROM g
ORDER BY dow, hod
"""


@query("events_seasonal_profile", oracle=_SEASONAL_ORACLE, survey_id="B-31-ext")
def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day seasonal surface of the event value —
    the 168-cell profile behind seasonal-naive baselines and
    "is this Tuesday 3pm normal for a Tuesday 3pm" anomaly checks.
    Day-of-week is computed as (epoch_days + 4) % 7 (0 = Sunday) — an
    integer formula identical in both engines, deliberately sidestepping
    the engines' conflicting dayofweek/dow numbering conventions
    (SURVEY §5.3 rule 6). Cents-scaled integer sums; two floats at the
    end, mirrored.

    Scale shape: one scan → one keyed agg to ≤168 cells with integer
    map-side partials; global totals are windows over the cell frame."""
    e = table(spark, sf_dir, "events")
    dow = (
        (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400).cast("long") + 4
    ) % 7
    cells = e.groupBy(
        dow.alias("dow"), F.hour("ts").cast("long").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    glob = Window.partitionBy()
    tot_n = F.sum("n").over(glob)
    tot_cents = F.sum("cents").over(glob)
    mean_cell = F.col("cents").cast("double") / F.col("n") / 100
    mean_glob = tot_cents.cast("double") / tot_n / 100
    return cells.select(
        "dow",
        "hod",
        F.col("n").cast("long").alias("n"),
        F.round(mean_cell, 4).alias("mean_value"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (F.round(mean_cell - mean_glob, 4) + F.lit(0.0)).alias(
            "dev_from_global"
        ),
    ).orderBy("dow", "hod")


# ---------------------------------------------------------------------------
# agg_winsorized_mean — robust mean via exact order-statistic clipping
# (wave 4)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH s AS (
  SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM s
),
bounds AS (
  SELECT MAX(CASE WHEN rn = (n - 1) // 20 + 1 THEN cents END) AS lo,
         MAX(CASE WHEN rn = (n - 1) * 19 // 20 + 1 THEN cents END) AS hi,
         MAX(n) AS n
  FROM r
)
SELECT CAST(b.n AS BIGINT) AS n,
       CAST(b.lo AS BIGINT) AS lo_cents, CAST(b.hi AS BIGINT) AS hi_cents,
       round(CAST(SUM(least(greatest(r.cents, b.lo), b.hi)) AS DOUBLE)
             / b.n / 100, 4) AS winsorized_mean,
       round(CAST(SUM(r.cents) AS DOUBLE) / b.n / 100, 4) AS raw_mean
FROM r CROSS JOIN bounds b
GROUP BY b.n, b.lo, b.hi
"""


@query("agg_winsorized_mean", oracle=_WINSOR_ORACLE, survey_id="B-25-ext")
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized mean of the purchase value — the robust-statistics
    staple (clip to the exact p05/p95 ORDER STATISTICS, then average).
    The bounds are discrete order statistics picked by integer rank
    (rank = ⌊(n−1)·k/20⌋ + 1 — FLOOR division in both engines, so the
    predicate hits a real row for every n, not just (n−1) % 20 == 0;
    row_number tie-broken by event_id), NOT
    interpolated quantiles — interpolation arithmetic differs across
    engines in op order, order statistics cannot (SURVEY §5.3). All
    sums are exact integer cents.

    Scale shape: rank + clip over the sample (global-order caveat as
    KS — bin or range-partition the rank at 100 TB); one pass each for
    ranks, bounds (2 conditional MAXes on the ranked frame), and the
    clipped sum."""
    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    s = e.select(
        "event_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    r = s.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    n = F.col("n")
    # INTEGER rank arithmetic (floor // in the oracle): float `/` makes
    # the rank predicate non-integral whenever (n-1) % 20 != 0, so lo/hi
    # silently resolve to NULL and winsorized == raw in both engines —
    # a mirrored flaw the cross-engine hash can't see (ADVICE r08 #1).
    bounds = r.agg(
        F.max(
            F.when(F.col("rn") == F.floor((n - 1) / 20) + 1, F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.floor((n - 1) * 19 / 20) + 1, F.col("cents")
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    j = r.crossJoin(bounds.select(F.col("lo"), F.col("hi"), F.col("n").alias("n_tot")))
    return j.groupBy("n_tot", "lo", "hi").agg(
        F.round(
            F.sum(F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")))
            .cast("double")
            / F.col("n_tot")
            / 100,
            4,
        ).alias("winsorized_mean"),
        F.round(
            F.sum("cents").cast("double") / F.col("n_tot") / 100, 4
        ).alias("raw_mean"),
    ).select(
        F.col("n_tot").cast("long").alias("n"),
        F.col("lo").cast("long").alias("lo_cents"),
        F.col("hi").cast("long").alias("hi_cents"),
        "winsorized_mean",
        "raw_mean",
    )


# ---------------------------------------------------------------------------
# embed_power_iteration — dominant eigenpair of the embedding covariance
# (wave 4): iterative linear algebra certified against a declarative twin
# ---------------------------------------------------------------------------

_POWER_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS qe
  FROM embeddings
),
idx AS (SELECT unnest(range(0, 64)) AS i),
pairs AS (
  SELECT a.i AS i, b.i AS j, q.qe[a.i + 1] AS qi, q.qe[b.i + 1] AS qj
  FROM q, idx a, idx b WHERE a.i <= b.i
),
m AS (
  SELECT i, j, COUNT(*) AS n, SUM(qi) AS s_i, SUM(qj) AS s_j,
         SUM(qi * qj) AS s_ij
  FROM pairs GROUP BY i, j
),
cov_tri AS (
  SELECT i, j,
         round((CAST(s_ij AS DOUBLE) - CAST(s_i AS DOUBLE) * s_j / n)
               / (n - 1) / 1000000000000.0, 6) + 0.0 AS c
  FROM m
),
cfull AS (
  SELECT i, j, c FROM cov_tri
  UNION ALL
  SELECT j AS i, i AS j, c FROM cov_tri WHERE i <> j
),
v0 AS (SELECT unnest(range(0, 64)) AS i, 0.125 AS v),
w1 AS (
  SELECT cf.i, list_reduce(array_agg(cf.c * v0.v ORDER BY cf.j),
                           (a, x) -> a + x) AS w
  FROM cfull cf JOIN v0 ON v0.i = cf.j GROUP BY cf.i
),
n1 AS (SELECT sqrt(list_reduce(array_agg(w * w ORDER BY i),
                               (a, x) -> a + x)) AS nrm FROM w1),
v1 AS (SELECT i, w / (SELECT nrm FROM n1) AS v FROM w1),
w2 AS (
  SELECT cf.i, list_reduce(array_agg(cf.c * v1.v ORDER BY cf.j),
                           (a, x) -> a + x) AS w
  FROM cfull cf JOIN v1 ON v1.i = cf.j GROUP BY cf.i
),
n2 AS (SELECT sqrt(list_reduce(array_agg(w * w ORDER BY i),
                               (a, x) -> a + x)) AS nrm FROM w2),
v2 AS (SELECT i, w / (SELECT nrm FROM n2) AS v FROM w2),
w3 AS (
  SELECT cf.i, list_reduce(array_agg(cf.c * v2.v ORDER BY cf.j),
                           (a, x) -> a + x) AS w
  FROM cfull cf JOIN v2 ON v2.i = cf.j GROUP BY cf.i
),
n3 AS (SELECT sqrt(list_reduce(array_agg(w * w ORDER BY i),
                               (a, x) -> a + x)) AS nrm FROM w3)
SELECT CAST(w3.i AS BIGINT) AS i,
       round(w3.w / n3.nrm, 6) + 0.0 AS eigvec,
       round(n3.nrm, 6) + 0.0 AS eigenvalue
FROM w3 CROSS JOIN n3
ORDER BY i
"""


@query("embed_power_iteration", oracle=_POWER_ORACLE, survey_id="north-star")
def embed_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenpair of the embedding covariance by THREE unrolled
    power-iteration steps (v₀ = 1/8 exactly; λ ≈ ‖Cv₂‖ since v₂ is
    unit) — the top principal component a whitening/PCA pipeline needs,
    and the repo's demonstration that an ITERATIVE linear-algebra
    kernel can be hash-certified against a purely declarative SQL twin.
    The distributed part is the covariance (embed_covariance_matrix's
    certified Arrow Gram kernel, composed here); every iteration is
    metadata-scale math over the 64×64 matrix relation.

    Float determinism: each matvec component and each norm is an
    ORDERED fold (sort by the summation index, Horner-style left fold)
    so both engines add the same doubles in the same order at every
    step; the covariance entering iteration 1 is the op's ROUNDED
    6-dp output, identical by construction. 3 iterations is enough to
    pin the plan shape; production would loop to tolerance with the
    same per-step certification.

    Scale shape: one distributed Gram pass, then 3 broadcast-joined
    64-row matvecs — iteration cost is independent of corpus size."""
    cov = embed_covariance_matrix(spark, sf_dir).select("i", "j", "cov")
    cfull = cov.unionByName(
        cov.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("cov")
        )
    ).select("i", "j", F.col("cov").alias("c"))

    spark_range = spark.range(0, 64).select(
        F.col("id").alias("i"), F.lit(0.125).alias("v")
    )
    v = spark_range

    def matvec(vdf: DataFrame) -> DataFrame:
        joined = cfull.join(
            F.broadcast(vdf.select(F.col("i").alias("j"), "v")), "j"
        )
        return joined.groupBy("i").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("j"), (F.col("c") * F.col("v")).alias("t")
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("w")
        )

    def norm_of(wdf: DataFrame) -> DataFrame:
        return wdf.agg(
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    F.col("i"),
                                    (F.col("w") * F.col("w")).alias("t"),
                                )
                            )
                        ),
                        lambda s: s["t"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("nrm")
        )

    for _ in range(2):
        w = matvec(v)
        v = w.crossJoin(norm_of(w)).select(
            "i", (F.col("w") / F.col("nrm")).alias("v")
        )
    w3 = matvec(v)
    return (
        w3.crossJoin(norm_of(w3))
        .select(
            F.col("i").cast("long").alias("i"),
            # + 0.0 mirrors the oracle's signed-zero normalization
            # (SURVEY §5.3 rule 8)
            (F.round(F.col("w") / F.col("nrm"), 6) + F.lit(0.0)).alias("eigvec"),
            (F.round(F.col("nrm"), 6) + F.lit(0.0)).alias("eigenvalue"),
        )
        .orderBy("i")
    )


# ---------------------------------------------------------------------------
# text_cross_lingual_overlap — pairwise vocabulary Jaccard across languages
# (wave 5)
# ---------------------------------------------------------------------------

_XLING_ORACLE = """
WITH vocab AS (
  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w FROM documents
),
sizes AS (SELECT lang, COUNT(*) AS nv FROM vocab GROUP BY lang),
shared AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
  FROM vocab a JOIN vocab b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT s.lang_a, s.lang_b,
       CAST(sa.nv AS BIGINT) AS vocab_a, CAST(sb.nv AS BIGINT) AS vocab_b,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       round(CAST(s.n_shared AS DOUBLE)
             / (sa.nv + sb.nv - s.n_shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.lang = s.lang_a
JOIN sizes sb ON sb.lang = s.lang_b
ORDER BY s.lang_a, s.lang_b
"""


@query("text_cross_lingual_overlap", oracle=_XLING_ORACLE, survey_id="north-star")
def text_cross_lingual_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between every language pair — the
    corpus-composition probe behind "is the zh slice actually zh, or
    mislabeled en" checks (a suspiciously high cross-lingual overlap
    flags label noise or boilerplate bleed). Vocabulary = distinct
    (lang, word); overlap is a word-keyed self-join whose fan-out per
    word is bounded by |langs|² — never doc×doc or word×word.

    Scale shape: explode → DISTINCT (the heavy, uniform shuffle) →
    word-keyed equi-join bounded at |langs| rows per key → one keyed
    agg to |langs|² pairs; the sizes join is metadata-scale. Integer
    counts until the final ratio."""
    docs = table(spark, sf_dir, "documents")
    vocab = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("nv"))
    shared = (
        vocab.alias("a")
        .join(
            vocab.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("lang").alias("lang_a"), F.col("nv").alias("vocab_a"))),
            "lang_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("lang").alias("lang_b"), F.col("nv").alias("vocab_b"))),
            "lang_b",
        )
        .select(
            "lang_a",
            "lang_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


# ---------------------------------------------------------------------------
# agg_quantile_bands_exact — decile bands per group via integer-rank
# order statistics (wave 5)
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH s AS (
  SELECT event_type, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s
),
k AS (SELECT unnest(range(0, 11)) AS decile)
SELECT r.event_type, CAST(k.decile AS BIGINT) AS decile,
       CAST(r.n AS BIGINT) AS n,
       round(CAST(r.cents AS DOUBLE) / 100, 2) AS value
FROM r CROSS JOIN k
WHERE r.rn = (r.n - 1) * k.decile // 10 + 1
ORDER BY r.event_type, decile
"""


@query("agg_quantile_bands_exact", oracle=_DECILE_ORACLE, survey_id="B-25-ext")
def agg_quantile_bands_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile bands (d0=min..d10=max) of the event value per
    event type — the per-group distribution summary a monitoring
    dashboard draws, computed as INTEGER-RANK order statistics
    (rank = (n−1)·k/10 + 1, row_number tie-broken by event_id) rather
    than interpolated quantiles, for the same cross-engine float
    reason as agg_winsorized_mean. Complements agg_median_quantile
    (interpolating, single quantile) with the exact banded form.

    Scale shape: one rank window per group key (parallel across
    event types) + a ×11 filter against the decile rank set — the
    shuffle carries (type, cents) pairs once; nothing downstream
    scales with rows."""
    e = table(spark, sf_dir, "events")
    s = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    r = s.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    k = spark.range(0, 11).select(F.col("id").alias("decile"))
    return (
        r.crossJoin(F.broadcast(k))
        .where(
            F.col("rn")
            == F.floor((F.col("n") - 1) * F.col("decile") / 10) + 1
        )
        .select(
            "event_type",
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("cents").cast("double") / 100, 2).alias("value"),
        )
        .orderBy("event_type", "decile")
    )


# ---------------------------------------------------------------------------
# agg_t_test_welch — unequal-variance t-test (wave 6)
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH s AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT is_a, COUNT(*) AS n, SUM(cents) AS sc, SUM(cents * cents) AS sc2
  FROM s GROUP BY is_a
),
w AS (
  SELECT MAX(CASE WHEN is_a = 1 THEN n END) AS na,
         MAX(CASE WHEN is_a = 1 THEN sc END) AS sa,
         MAX(CASE WHEN is_a = 1 THEN sc2 END) AS sa2,
         MAX(CASE WHEN is_a = 0 THEN n END) AS nb,
         MAX(CASE WHEN is_a = 0 THEN sc END) AS sb,
         MAX(CASE WHEN is_a = 0 THEN sc2 END) AS sb2
  FROM g
),
m AS (
  SELECT na, nb,
         CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
         (CAST(sa2 AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1)
           / na AS vna,
         (CAST(sb2 AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)
           / nb AS vnb
  FROM w
)
SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_purchase,
       round(ma / 100, 4) AS mean_click,
       round(mb / 100, 4) AS mean_purchase,
       round((ma - mb) / sqrt(vna + vnb), 4) + 0.0 AS t_stat,
       round((vna + vnb) * (vna + vnb)
             / (vna * vna / (na - 1) + vnb * vnb / (nb - 1)), 2) AS df_welch
FROM m
"""


@query("agg_t_test_welch", oracle=_WELCH_ORACLE, survey_id="B-25-ext")
def agg_t_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the click and purchase
    value samples, with the Welch–Satterthwaite effective degrees of
    freedom — completing the suite's test battery (z for proportions,
    U for ranks, permutation for no-assumptions, d for magnitude, t
    for means under unequal variance). Exact integer cents moments;
    vna/vnb (variance-over-n) are computed ONCE as named intermediates
    so the t and df expressions share the identical doubles in both
    engines.

    Scale shape: identical to agg_effect_size_cohens_d — one keyed agg
    with integer partials, then constant-size math."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = e.select(
        (F.col("event_type") == "click").cast("long").alias("is_a"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    g = s.groupBy("is_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("cents") * F.col("cents")).alias("sc2"),
    )
    w = g.agg(
        F.max(F.when(F.col("is_a") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("is_a") == 1, F.col("sc"))).alias("sa"),
        F.max(F.when(F.col("is_a") == 1, F.col("sc2"))).alias("sa2"),
        F.max(F.when(F.col("is_a") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("is_a") == 0, F.col("sc"))).alias("sb"),
        F.max(F.when(F.col("is_a") == 0, F.col("sc2"))).alias("sb2"),
    )
    na, nb, sa, sb = F.col("na"), F.col("nb"), F.col("sa"), F.col("sb")
    m = w.select(
        na,
        nb,
        (sa.cast("double") / na).alias("ma"),
        (sb.cast("double") / nb).alias("mb"),
        (
            (F.col("sa2").cast("double") - sa.cast("double") * sa / na)
            / (na - 1)
            / na
        ).alias("vna"),
        (
            (F.col("sb2").cast("double") - sb.cast("double") * sb / nb)
            / (nb - 1)
            / nb
        ).alias("vnb"),
    )
    vna, vnb = F.col("vna"), F.col("vnb")
    return m.select(
        na.cast("long").alias("n_click"),
        nb.cast("long").alias("n_purchase"),
        F.round(F.col("ma") / 100, 4).alias("mean_click"),
        F.round(F.col("mb") / 100, 4).alias("mean_purchase"),
        # + 0.0 → signed-zero normalization (SURVEY §5.3 rule 8)
        (
            F.round((F.col("ma") - F.col("mb")) / F.sqrt(vna + vnb), 4)
            + F.lit(0.0)
        ).alias("t_stat"),
        F.round(
            (vna + vnb) * (vna + vnb)
            / (vna * vna / (na - 1) + vnb * vnb / (nb - 1)),
            2,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# win_lag_features_matrix — supervised-learning feature materialization
# (wave 6)
# ---------------------------------------------------------------------------

_LAGFEAT_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
feat AS (
  SELECT event_type, h, cents,
         lag(cents, 1)  OVER w AS lag1,
         lag(cents, 2)  OVER w AS lag2,
         lag(cents, 3)  OVER w AS lag3,
         lag(cents, 24) OVER w AS lag24,
         SUM(cents)  OVER (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS s24,
         COUNT(*)    OVER (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS n24
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
)
SELECT event_type, h, cents AS y_cents,
       lag1, lag2, lag3, lag24,
       round(CAST(s24 AS DOUBLE) / n24, 4) AS ma24_cents
FROM feat
ORDER BY event_type, h
"""


@query("win_lag_features_matrix", oracle=_LAGFEAT_ORACLE, survey_id="B-31-ext")
def win_lag_features_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-learning feature materialization for the hourly
    revenue series: lag-1/2/3/24 and trailing-24 mean per event type —
    the feature-matrix build a forecasting pipeline runs before
    training (the engine-side half of a feature store write; pairs
    with feature_pit_join's point-in-time read). Lags are over
    OBSERVED hours (the standard dense-series assumption; run
    events_gap_fill first for calendar-dense lags). Integer cents
    throughout; one float at the end — and that mean is reported in
    CENTS: a ROUND(x,4) half-way tie for s24/n24 requires the reduced
    denominator of s24·10⁴/n24 to be exactly 2, i.e. 2⁵ | n24 — and
    every frame length here is ≤ 24 < 32, so no tie exists and Spark's
    BigDecimal-HALF_UP vs DuckDB's std::round can't disagree. (NB: the
    invariant is divisibility by 2⁵, NOT "≤ 4 decimals" — 1/3 of a
    cent is non-terminating; a frame length ≥ 32 would need
    re-analysis. Dividing to dollars first reintroduces genuine
    5-decimal ties — hit and fixed here.)

    Scale shape: one keyed agg to the hourly grain, then one window
    spec per event_type partition — all five features share the same
    shuffle; nothing scales with raw rows after the first agg."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    fr = w.rowsBetween(-23, 0)
    return (
        hourly.select(
            "event_type",
            "h",
            F.col("cents").alias("y_cents"),
            F.lag("cents", 1).over(w).alias("lag1"),
            F.lag("cents", 2).over(w).alias("lag2"),
            F.lag("cents", 3).over(w).alias("lag3"),
            F.lag("cents", 24).over(w).alias("lag24"),
            F.round(
                F.sum("cents").over(fr).cast("double")
                / F.count(F.lit(1)).over(fr),
                4,
            ).alias("ma24_cents"),
        )
        .orderBy("event_type", "h")
    )


# ---------------------------------------------------------------------------
# embed_pairwise_distance_hist — embedding-collapse diagnostic on a hash
# sample (wave 6)
# ---------------------------------------------------------------------------

_PDIST_ORACLE = """
WITH sampled AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS q
  FROM embeddings
  WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) AS BIGINT)
        % 20 = 0
),
pairs AS (
  SELECT list_sum(list_transform(range(1, 65),
           i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))) AS d2
  FROM sampled a JOIN sampled b ON a.vec_id < b.vec_id
)
SELECT CAST(least(d2 // 5000000000000, 19) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY 1
ORDER BY bucket
"""


@query("embed_pairwise_distance_hist", oracle=_PDIST_ORACLE, survey_id="north-star")
def embed_pairwise_distance_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of pairwise squared L2 distances over a ~5% md5-hash
    sample of the embedding table — the embedding-collapse diagnostic
    (a healthy space shows a broad unimodal histogram; collapse piles
    mass in the lowest buckets). Distances are EXACT integers in
    micro-unit² (zip-fold of (qa−qb)², commutative int sums — no float
    anywhere), bucketed at a fixed 5e12 step into 20 bins.

    Scale shape: the pairwise product runs ONLY on the hash sample —
    |sample|² pairs, deterministic and engine-identical (md5 % 20),
    never the full N². At 100 TB you tune the sample modulus so
    |sample| stays ~10⁴ (10⁸ pairs) regardless of corpus size; the
    full-table path is the IVF/LSH family, not this diagnostic."""
    emb = table(spark, sf_dir, "embeddings")
    sampled = emb.where(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 20
        == 0
    ).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000.0, 0).cast("long"),
        ).alias("q"),
    )
    pairs = (
        sampled.alias("a")
        .join(sampled.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.aggregate(
                F.zip_with(
                    F.col("a.q"),
                    F.col("b.q"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2")
        )
    )
    return (
        pairs.groupBy(
            F.least(F.floor(F.col("d2") / 5000000000000), F.lit(19))
            .cast("long")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bucket")
    )
