"""Faithful end-to-end reproduction of the reference pipeline
(SURVEY.md §3.1 Path 1): gzipped CloudTrail-shaped log files
(``{"Records": [...]}``) → decompress → envelope parse → Records[]
unwrap → partition-keyed, 500-chunked, retrying Kinesis delivery.

Maps the reference operators 1:1 (upstream ``main.go`` approx):
- A-4 source discovery  → file-source listing + checkpoint
- A-5 S3 GetObject      → file reader
- A-6 gzip              → native ``.gz`` codec
- A-7 envelope parse    → ``from_json`` with explicit envelope schema +
                          ``explode`` (records kept as raw JSON strings,
                          exactly the reference's ``json.RawMessage``)
- A-8..A-10 sink        → sinks.put_records_chunked via foreachBatch

The one semantic upgrade over the reference: records stay opaque AND a
parsed analytics view is available from the same plan (SURVEY.md §1.2
"fidelity mode + analytics mode").
"""

from __future__ import annotations

import gzip
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query
from cloudtrail_streamer_spark.streaming.sinks import KinesisStubClient, put_records_chunked

ENVELOPE_SCHEMA = "STRUCT<Records: ARRAY<STRING>>"


def write_cloudtrail_files(spark: SparkSession, sf_dir: str, files: int = 8) -> str:
    """Materialize events as CloudTrail-shaped gzipped log files: each
    file is one JSON object {"Records": [<record>, ...]} (the S3 object
    format CloudTrail delivers; SURVEY.md §1.1)."""
    ev = table(spark, sf_dir, "events")
    pdf = ev.orderBy("event_id").toPandas()
    out = tempfile.mkdtemp(prefix="cts_ctlogs_")
    n = len(pdf)
    per = (n + files - 1) // files
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        records = []
        for r in chunk.to_dict(orient="records"):
            r = dict(r)
            r["ts"] = r["ts"].isoformat()
            records.append(json.dumps(r))
        body = json.dumps({"Records": [json.loads(x) for x in records]})
        with gzip.open(os.path.join(out, f"ctlog_{i:04d}.json.gz"), "wt") as f:
            f.write(body)
    return out


def unwrap_records(raw: DataFrame) -> DataFrame:
    """A-7: envelope parse + Records[] unwrap. Records emerge as opaque
    JSON strings (fidelity mode) with a parsed struct alongside
    (analytics mode)."""
    rec = F.explode(
        F.from_json(F.col("value"), ENVELOPE_SCHEMA).getField("Records")
    ).alias("record")
    parsed = F.from_json(
        F.col("record"),
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).alias("parsed")
    return raw.select(rec).select("record", parsed)


@query("cloudtrail_pipeline_e2e", survey_id="A-2..A-10")  # Tier R: full pipeline
def cloudtrail_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference, one query: CloudTrail-shaped .json.gz files
    streamed in, Records unwrapped, delivered through the chunked
    retrying Kinesis writer (partition key = awsRegion-analog user_id),
    spool read back and counted per event_type (== source counts;
    asserted in tests/test_streaming.py)."""
    logs_dir = write_cloudtrail_files(spark, sf_dir)
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(logs_dir)
    )
    spool = tempfile.mkdtemp(prefix="cts_ct_spool_")
    client = KinesisStubClient(spool, fail_every=7)

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            unwrap_records(batch_df)
            .select(
                F.col("parsed.user_id").cast("string").alias("pk"),
                F.col("record").alias("data"),
            )
            .collect()
        )
        records = [
            {"Data": r["data"].encode("utf-8"), "PartitionKey": r["pk"] or "0"}
            for r in rows
        ]
        put_records_chunked(client, "cloudtrail-stream", records)

    q = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cts_ckpt_ct_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    delivered = spark.read.json(spool)
    return (
        delivered.select(F.get_json_object("data", "$.event_type").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
