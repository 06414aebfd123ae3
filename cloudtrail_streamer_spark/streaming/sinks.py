"""Sink operators (SURVEY.md §2.B B-5 partner, B-6) — A-8..A-10 analogs.

``KinesisStubClient`` is boto3-shaped (``put_records(StreamName=...,
Records=[{"Data": bytes, "PartitionKey": str}, ...])`` returning
``{"FailedRecordCount": int, "Records": [...]}``), so swapping in a real
``boto3.client("kinesis")`` is config-only (SURVEY.md §7 step 5). The
writer reproduces the reference's batching contract exactly:

- ≤500 records and ≤5 MB per PutRecords call (upstream ``main.go:~60-80``
  approx; AWS limit — BASELINE.md §1),
- partial-failure retry: entries flagged failed are re-enqueued until
  delivered (at-least-once, ``main.go:~80-100`` approx),
- per-record partition key (``main.go:~65-75`` approx).

In Structured Streaming the writer runs inside ``foreachBatch``; the
checkpoint gives batch-level replay, preserving the reference's
at-least-once semantics with idempotence left to the sink (batchId is
passed through for dedup-capable sinks).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

MAX_BATCH_RECORDS = 500
MAX_BATCH_BYTES = 5 * 1024 * 1024
MAX_RECORD_BYTES = 1024 * 1024


class KinesisStubClient:
    """Local stand-in for boto3 kinesis: persists delivered records to a
    spool dir; deterministically fails every 7th record's first attempt
    to exercise the retry path."""

    def __init__(self, spool_dir: str, fail_every: int = 7):
        self.spool_dir = spool_dir
        self.fail_every = fail_every
        self._seen: set[bytes] = set()
        self._call = 0
        os.makedirs(spool_dir, exist_ok=True)

    def put_records(self, StreamName: str, Records: list[dict]) -> dict:
        if len(Records) > MAX_BATCH_RECORDS:
            raise ValueError("PutRecords batch exceeds 500 records")
        if sum(len(r["Data"]) for r in Records) > MAX_BATCH_BYTES:
            raise ValueError("PutRecords batch exceeds 5 MB")
        self._call += 1
        out, failed = [], 0
        spool = open(os.path.join(self.spool_dir, f"call_{self._call:06d}.jsonl"), "w")
        for i, rec in enumerate(Records):
            first_attempt = rec["Data"] not in self._seen
            if self.fail_every and first_attempt and i % self.fail_every == self.fail_every - 1:
                self._seen.add(rec["Data"])
                failed += 1
                out.append({"ErrorCode": "ProvisionedThroughputExceededException"})
                continue
            self._seen.add(rec["Data"])
            spool.write(
                json.dumps(
                    {"pk": rec["PartitionKey"], "data": rec["Data"].decode("utf-8")}
                )
                + "\n"
            )
            out.append({"SequenceNumber": str(len(self._seen)), "ShardId": "shard-0"})
        spool.close()
        return {"FailedRecordCount": failed, "Records": out}


def put_records_chunked(client, stream_name: str, records: list[dict]) -> int:
    """The reference's batch loop (A-8/A-9): chunk to 500/5 MB, send,
    re-enqueue failed entries until none remain. Returns delivered count."""
    delivered = 0
    pending = list(records)
    while pending:
        batch: list[dict] = []
        nbytes = 0
        while pending and len(batch) < MAX_BATCH_RECORDS:
            sz = len(pending[0]["Data"]) + len(pending[0]["PartitionKey"])
            if sz > MAX_RECORD_BYTES:
                raise ValueError("record exceeds 1 MB Kinesis limit")
            if nbytes + sz > MAX_BATCH_BYTES:
                break
            rec = pending.pop(0)
            batch.append(rec)
            nbytes += sz
        resp = client.put_records(StreamName=stream_name, Records=batch)
        if resp["FailedRecordCount"]:
            for rec, status in zip(batch, resp["Records"]):
                if "ErrorCode" in status:
                    pending.append(rec)
        delivered += len(batch) - resp["FailedRecordCount"]
    return delivered


@query("sink_foreachbatch_kinesis", survey_id="B-6")  # Tier R: sink harness
def sink_foreachbatch_kinesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch Kinesis delivery of the events stream (stubbed sink):
    JSON-serialize each event (partition key = user_id, A-10 analog),
    deliver through the chunked retrying writer, then read the spool back
    and count per event_type — equals the source counts despite injected
    partial failures (at-least-once, exactly-once here since the stub
    dedups by payload)."""
    from cloudtrail_streamer_spark.streaming import harness

    replay = harness.write_replay_files(spark, sf_dir)
    stream = harness.read_replay_stream(spark, replay)
    spool = tempfile.mkdtemp(prefix="cts_kinesis_spool_")
    client = KinesisStubClient(spool)

    payload = F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value", "props"))

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(
            F.col("user_id").cast("string").alias("pk"), payload.alias("data")
        ).collect()
        records = [
            {"Data": r["data"].encode("utf-8"), "PartitionKey": r["pk"]} for r in rows
        ]
        put_records_chunked(client, "cloudtrail-stream", records)

    q = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cts_ckpt_sink_"))
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
