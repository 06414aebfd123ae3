"""Deterministic stream-replay fixtures (FIXTURES.md §streaming).

Materializes the ``events`` table as ordered gzipped JSON-lines files
(one per day bucket, zero-padded names so file-source listing order ==
event-time order), optionally with injected duplicates or late rows.
``Trigger.AvailableNow`` + ``maxFilesPerTrigger=1`` then replays them
with exact batch boundaries — the deterministic stand-in for the
reference's one-Lambda-invoke-per-S3-delivery loop (upstream
``main.go:~190-225`` approx).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table

EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def write_replay_files(
    spark: SparkSession,
    sf_dir: str,
    *,
    duplicate: bool = False,
    hold_back_pct: int | None = None,
) -> str:
    """Write events as per-day json.gz files under a fresh temp dir.

    duplicate: each day's rows are ALSO appended to the next day's file
    (adjacent-file duplicates for B-49).
    hold_back_pct: rows with event_id % 100 < pct are delayed by two
    days (late arrivals for B-48).
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp"))
    )
    if hold_back_pct is not None:
        ev = ev.withColumn(
            "day",
            F.when(F.col("event_id") % 100 < hold_back_pct, F.col("day") + 2).otherwise(
                F.col("day")
            ),
        )
    out = tempfile.mkdtemp(prefix="cts_replay_")
    days = [r[0] for r in ev.select("day").distinct().collect()]
    pdf_all = ev.orderBy("ts", "event_id").toPandas()
    import gzip

    for day in sorted(days):
        part = pdf_all[pdf_all["day"] == day].drop(columns=["day"])
        rows = part.to_dict(orient="records")
        if duplicate and day - 1 in days:
            prev = pdf_all[pdf_all["day"] == day - 1].drop(columns=["day"])
            rows = rows + prev.to_dict(orient="records")
        path = os.path.join(out, f"events_{day:04d}.json.gz")
        with gzip.open(path, "wt") as f:
            import json

            for r in rows:
                r = dict(r)
                r["ts"] = r["ts"].isoformat()
                f.write(json.dumps(r) + "\n")
    return out


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the sink contents as a batch DataFrame."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"cts_ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def read_replay_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    """File-source stream over replay files, one file per micro-batch."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(replay_dir)
    )
