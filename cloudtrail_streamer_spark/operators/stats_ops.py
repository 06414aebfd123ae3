"""ANALYZE-equivalent statistics collection (VERDICT r03 #8).

The batch half of the CBO story in ``cloudtrail_streamer_spark.stats``:
one Spark job computes the per-column statistics an ANALYZE TABLE ...
COMPUTE STATISTICS FOR COLUMNS run would persist to the metastore —
row count, distinct count, null count, min/max. ``stats.row_count``
(parquet-footer metadata) is the free tier operators consult for kernel
routing; this op is the full tier and is itself driver-checked.

See SCALE.md §CBO for when these numbers matter at 100 TB (join
reordering across ≥3 facts, broadcast-side election near the 10 MB
threshold, skew detection from NDV vs row count).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query

# (table, column, value-expression builder). Money columns are scaled to
# integer cents BEFORE min/max so both engines compare exact BIGINTs —
# the repo-wide determinism rule (never hash raw doubles).
_STAT_COLS = (
    ("orders", "o_custkey", None),
    ("orders", "o_totalprice", "cents"),
    ("lineitem", "l_partkey", None),
    ("lineitem", "l_quantity", None),
    ("customer", "c_custkey", None),
    ("events", "user_id", None),
)

_CBO_STATS_ORACLE = """
SELECT * FROM (
  SELECT 'orders' AS table_name, 'o_custkey' AS column_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
         CAST(MIN(o_custkey) AS BIGINT) AS min_v,
         CAST(MAX(o_custkey) AS BIGINT) AS max_v
  FROM orders
  UNION ALL
  SELECT 'orders', 'o_totalprice', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
         CAST(MIN(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
         CAST(MAX(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem', 'l_partkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
         CAST(COUNT(*) - COUNT(l_partkey) AS BIGINT),
         CAST(MIN(l_partkey) AS BIGINT), CAST(MAX(l_partkey) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_quantity', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
         CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
         CAST(MIN(l_quantity) AS BIGINT), CAST(MAX(l_quantity) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'customer', 'c_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
         CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT),
         CAST(MIN(c_custkey) AS BIGINT), CAST(MAX(c_custkey) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'events', 'user_id', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT user_id) AS BIGINT),
         CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
         CAST(MIN(user_id) AS BIGINT), CAST(MAX(user_id) AS BIGINT)
  FROM events
) s
ORDER BY table_name, column_name
"""


@query("agg_cbo_stats", oracle=_CBO_STATS_ORACLE, survey_id="B-25-ext")
def agg_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics as one relation: for each
    (table, column) pair — row count, exact NDV, null count, min, max
    (money pre-scaled to integer cents). One aggregate job per table
    (columns of a table share the scan; tables run as parallel jobs);
    n_distinct is exact here so the driver can hash it — production
    ANALYZE swaps in approx_count_distinct's HLL sketch, same plan
    shape, one pass either way. The consumer contract is
    cloudtrail_streamer_spark.stats + SCALE.md §CBO: join reordering
    and broadcast election read these numbers from the catalog instead
    of guessing — at 100 TB a wrong build side costs a full extra
    shuffle of the big fact."""
    per_table: dict[str, list] = {}
    for tbl, col, kind in _STAT_COLS:
        per_table.setdefault(tbl, []).append((col, kind))

    outs = []
    for tbl, cols in per_table.items():
        df = table(spark, sf_dir, tbl)
        aggs = []
        for col, kind in cols:
            # Aggregate the RAW column (cents pre-scale excepted) and cast
            # only the FINAL min/max — a per-row pre-cast would truncate
            # fractional values before NDV/min/max while the oracle casts
            # after aggregating (ADVICE r04). Non-cents _STAT_COLS must be
            # integral-valued anyway (the final long cast of min/max is
            # only exact then); kind='cents' is the fractional path.
            v = cents(col) if kind == "cents" else F.col(col)
            aggs += [
                F.count(F.lit(1)).cast("long").alias(f"{col}__n_rows"),
                F.count_distinct(v).cast("long").alias(f"{col}__n_distinct"),
                (F.count(F.lit(1)) - F.count(v)).cast("long").alias(f"{col}__n_nulls"),
                F.min(v).cast("long").alias(f"{col}__min_v"),
                F.max(v).cast("long").alias(f"{col}__max_v"),
            ]
        wide = df.agg(*aggs)
        # ONE select over the 1-row wide agg, unpivoted with stack():
        # a per-column wide.select(...) each would re-expand the agg
        # subtree — Catalyst does not dedupe — and scan the table once
        # per column (caught by tools/scan_sweep.py in r4).
        stack_args = ", ".join(
            f"'{col}', {col}__n_rows, {col}__n_distinct, {col}__n_nulls, "
            f"{col}__min_v, {col}__max_v"
            for col, _kind in cols
        )
        outs.append(
            wide.select(
                F.lit(tbl).alias("table_name"),
                F.expr(
                    f"stack({len(cols)}, {stack_args}) AS "
                    "(column_name, n_rows, n_distinct, n_nulls, min_v, max_v)"
                ),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy("table_name", "column_name")
