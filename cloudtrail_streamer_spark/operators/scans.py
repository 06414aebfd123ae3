"""Scan / source / sink operators (SURVEY.md §2.B B-1, B-2, B-5).

Generalizes the reference's source/sink path: S3 object fetch + gzip +
parse (A-5..A-7, upstream ``main.go:~120-165`` approx) becomes a Catalyst
parquet scan with pushdown; the partition-keyed Kinesis write (A-9/A-10,
``main.go:~60-100``) becomes a partitioned parquet write.

Scale notes: B-2's filter+projection reach the parquet reader
(``PushedFilters`` / ``ReadSchema`` asserted in tests/test_plans.py), so
at 100 TB the scan skips row groups and never materializes dead columns.
B-5's ``partitionBy`` is the layout that makes downstream partition
pruning (and DPP) possible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import scratch_dir, table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM lineitem", survey_id="B-1")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns — the identity plan (vectorized reader)."""
    return table(spark, sf_dir, "lineitem")


_PRUNED_ORACLE = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


@query("scan_pruned", oracle=_PRUNED_ORACLE, survey_id="B-2")
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + predicate pushdown into the parquet reader."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    ).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )


_DPP_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type,
         CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
              WHEN event_type IN ('purchase', 'signup') THEN 'revenue'
              ELSE 'ops' END AS tier
  FROM events
)
SELECT e.event_type, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(e.event_id) AS BIGINT) AS id_sum
FROM events e
JOIN d ON e.event_type = d.event_type
WHERE d.tier = 'engagement'
GROUP BY e.event_type, d.tier
"""


@query("join_dpp_partitioned", oracle=_DPP_ORACLE, survey_id="B-5-ext")
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over the B-5 layout (SURVEY §4.2).

    The fact (events) is laid out hive-partitioned by event_type; the
    dim (event_type → tier) is a parquet scan with a selective tier
    filter. Joining fact to dim on the partition column makes Catalyst
    inject a DynamicPruning subquery into the fact scan's
    PartitionFilters (asserted in tests/test_plans.py): at 100 TB the
    fact reads ONLY the partitions whose keys survive the dim filter —
    the dim's values are known at runtime via the reused broadcast, so
    no static pruning could do this. This is the S3-layout payoff of
    CloudTrail's region/date partitioning at query time."""
    ev = table(spark, sf_dir, "events")
    base = scratch_dir("join_dpp_partitioned", sf_dir)
    fact_path = os.path.join(base, "events_parted")
    dim_path = os.path.join(base, "event_dim")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    tier = (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type").isin("purchase", "signup"), "revenue")
        .otherwise("ops")
    )
    ev.select("event_type").distinct().withColumn("tier", tier).write.mode(
        "overwrite"
    ).parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tier") == "engagement")
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("id_sum"),
        )
    )


@query("sink_parquet_partitioned", oracle="SELECT * FROM events", survey_id="B-5")
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + read-back round trip (A-9/A-10 analog).

    ``partitionBy(event_type)`` is the hive-style layout CloudTrail uses
    on S3 (region/date keys); read-back restores the partition column.
    """
    ev = table(spark, sf_dir, "events")
    out = os.path.join(scratch_dir("sink_parquet_partitioned", sf_dir), "events_parted")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out)
    # partitionBy turns the partition column into a directory key; restore
    # original column order + types (partition values read back as strings
    # unless schema inference is on — select with explicit cast).
    return back.select(
        "event_id",
        "ts",
        "user_id",
        F.col("event_type").cast("string").alias("event_type"),
        "value",
        "props",
    )


_CSV_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderstatus
"""


@query("scan_csv_roundtrip", oracle=_CSV_ORACLE, survey_id="B-1-ext")
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source breadth: orders written as headered CSV (ISO timestamps,
    shortest-repr doubles), read back with an EXPLICIT schema — never
    inferSchema, which costs a full extra scan at 100 TB — and
    aggregated. H-tier: the round trip is lossless for this schema, so
    integer-cents totals match the parquet-sourced oracle exactly."""
    o = table(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("scan_csv_roundtrip", sf_dir), "orders_csv")
    o.write.mode("overwrite").option("header", True).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss"
    ).csv(out)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in o.schema.fields)
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .csv(out)
    )
    from cloudtrail_streamer_spark.functions import cents

    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).cast("long").alias("total_cents"),
    )


@query("scan_orc_roundtrip", oracle=_CSV_ORACLE, survey_id="B-1-ext")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source breadth: the same lossless round-trip contract as CSV,
    through Spark's built-in columnar ORC reader/writer (vectorized,
    predicate-pushdown-capable like parquet). Oracle is the parquet-
    sourced aggregate — if ORC round-tripping dropped or mangled rows,
    the integer-cents totals would mismatch."""
    o = table(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("scan_orc_roundtrip", sf_dir), "orders_orc")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    from cloudtrail_streamer_spark.functions import cents

    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).cast("long").alias("total_cents"),
    )


_SCHEMA_EVO_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n_with_status,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
"""


@query("scan_schema_evolution", oracle=_SCHEMA_EVO_ORACLE, survey_id="B-1-ext")
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written with
    DIFFERENT schemas (batch 2 adds o_orderstatus — the real-world
    "producer added a field" migration), read back as ONE table with
    mergeSchema; rows from the old batch surface NULL for the new
    column instead of failing the scan. The merged read must lose no
    rows and no values (count + cents-sum hash-checked); n_with_status
    counts exactly the new-schema rows. At 100 TB schema merge is a
    footer-only operation (no data rewrite) — which is why add-column
    is the zero-cost evolution path while rename/retype require a
    rewrite."""
    import os

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("price_cents"), "o_orderstatus"
    )
    base = scratch_dir("scan_schema_evolution", sf_dir)
    d = os.path.join(base, "orders_evolved")
    o.where(F.col("o_orderkey") % 2 == 0).drop("o_orderstatus").write.mode(
        "overwrite"
    ).parquet(d)
    o.where(F.col("o_orderkey") % 2 == 1).write.mode("append").parquet(d)
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("o_orderstatus").isNotNull().cast("long"))
        .cast("long")
        .alias("n_with_status"),
        F.sum("price_cents").cast("long").alias("total_cents"),
    )


_ROWGROUP_STATS_ORACLE = """
WITH b AS (
  SELECT o_orderkey, (o_orderkey * 2654435761) % 8 AS f
  FROM orders
)
SELECT CAST(f AS BIGINT) AS file_bucket,
       CAST(MIN(o_orderkey) AS BIGINT) AS stat_min,
       CAST(MAX(o_orderkey) AS BIGINT) AS stat_max,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM b GROUP BY f
"""


@query("scan_rowgroup_stats", oracle=_ROWGROUP_STATS_ORACLE, survey_id="B-2-ext")
def scan_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer statistics, read from the ACTUAL file metadata:
    orders are written as 8 hash-bucketed files; each file's row-group
    min/max/row-count for o_orderkey is then read back from the parquet
    FOOTERS via pyarrow (no data pages touched) and hash-checked against
    the per-bucket aggregates DuckDB computes from the rows. This is the
    machinery row-group skipping stands on — `scan_pruned`'s
    PushedFilters only skip because these stats exist and are correct;
    at 100 TB footer reads are the cheap planning path (KBs per file vs
    GBs of data). Only file-level metadata crosses the driver — one
    small row per file."""
    import os

    import pyarrow.parquet as pq

    o = table(spark, sf_dir, "orders").select("o_orderkey")
    bucketed = o.withColumn("file_bucket", (F.col("o_orderkey") * 2654435761) % 8)
    out = os.path.join(scratch_dir("scan_rowgroup_stats", sf_dir), "orders_bucketed")
    bucketed.repartition("file_bucket").write.partitionBy("file_bucket").mode(
        "overwrite"
    ).parquet(out)

    rows = []
    for d in sorted(os.listdir(out)):
        if not d.startswith("file_bucket="):
            continue
        bucket = int(d.split("=", 1)[1])
        mn, mx, n = None, None, 0
        for fn in os.listdir(os.path.join(out, d)):
            if not fn.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(out, d, fn)).metadata
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(0)  # o_orderkey
                st = col.statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
                n += meta.row_group(rg).num_rows
        rows.append((bucket, int(mn), int(mx), int(n)))
    return spark.createDataFrame(
        rows, "file_bucket long, stat_min long, stat_max long, n_rows long"
    )


# The fixture stores each table as ONE parquet file at every sf, so the
# basename is scale-invariant and the oracle can state it literally over
# the registered view — making the check portable across sf dirs (the r4
# cross-scale drive caught the previous path-pinned form failing at
# sf0.1 by construction). With a multi-file layout the oracle would need
# read_parquet(..., filename=true) + parse_filename on a literal path.
_FILE_META_ORACLE = """
SELECT 'orders.parquet' AS file_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders
"""


@query("scan_file_metadata", oracle=_FILE_META_ORACLE, survey_id="B-1-ext")
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-level lineage via the hidden ``_metadata`` struct: every row
    carries the file it came from (name, size, mod time) with NO user
    bookkeeping — the provenance primitive for 100 TB debugging ("which
    ingest file produced this bad row?") and for file-granular
    reprocessing/compaction decisions. Constant-folded at scan time
    (the values come from the file listing, not the data), so it adds
    no I/O. Here: per-file row counts + key checksum, hash-checked
    against the literal single-file basename the fixture guarantees at
    every sf (see _FILE_META_ORACLE note)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.select(
        F.col("_metadata.file_name").alias("file_name"), F.col("o_orderkey")
    ).groupBy("file_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


@query("scan_xml_roundtrip", oracle=_CSV_ORACLE, survey_id="B-1-ext")
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source breadth (built-in XML reader/writer, spark-xml merged
    into Spark 4 core): the same lossless round-trip contract as the
    CSV/ORC rows — orders written as row-tagged XML, read back with an
    EXPLICIT schema (never schema inference: for XML that is a full
    extra parse of every document at 100 TB), aggregated, and checked
    against the parquet-sourced oracle. XML is the interchange format
    the CloudTrail world still emits from legacy feeds; the engine
    treats it as just another scan whose parse cost is paid once at
    ingest, never in the relational core."""
    o = table(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("scan_xml_roundtrip", sf_dir), "orders_xml")
    o.write.mode("overwrite").format("xml").option("rootTag", "orders").option(
        "rowTag", "order"
    ).option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss").save(out)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in o.schema.fields)
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "order")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .load(out)
    )
    from cloudtrail_streamer_spark.functions import cents

    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).cast("long").alias("total_cents"),
    )
