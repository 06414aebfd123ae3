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

from cloudtrail_streamer_spark.streaming.harness import await_or_raise
from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

MAX_BATCH_RECORDS = 500
MAX_BATCH_BYTES = 5 * 1024 * 1024
MAX_RECORD_BYTES = 1024 * 1024


class KinesisStubClient:
    """Local stand-in for boto3 kinesis: persists delivered records to a
    spool dir; deterministically fails every 7th record's first attempt
    to exercise the retry path.

    ``prefix`` namespaces the spool files — executor-side delivery opens
    one client per (micro-batch, partition), so spool names must not
    collide across concurrent partition tasks."""

    def __init__(self, spool_dir: str, fail_every: int = 7, prefix: str = ""):
        self.spool_dir = spool_dir
        self.fail_every = fail_every
        self.prefix = prefix
        self._seen: set[bytes] = set()
        self._call = 0
        os.makedirs(spool_dir, exist_ok=True)

    def put_records(self, StreamName: str, Records: list[dict]) -> dict:
        if len(Records) > MAX_BATCH_RECORDS:
            raise ValueError("PutRecords batch exceeds 500 records")
        if sum(len(r["Data"]) for r in Records) > MAX_BATCH_BYTES:
            raise ValueError("PutRecords batch exceeds 5 MB")
        self._call += 1
        spool = open(
            os.path.join(self.spool_dir, f"call_{self.prefix}{self._call:06d}.jsonl"), "w"
        )
        out, failed = [], 0
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


def put_records_chunked(client, stream_name: str, records) -> int:
    """The reference's batch loop (A-8/A-9): chunk to 500/5 MB, send,
    re-enqueue failed entries until none remain. Returns delivered count.

    ``records`` may be any iterable (a list, or a partition iterator on
    an executor) — it is consumed lazily, one 500-record/5 MB batch at a
    time, so memory stays bounded by one batch plus the retry queue."""
    delivered = 0
    pending: list[dict] = []  # failed entries awaiting retry
    it = iter(records)
    exhausted = False
    while not exhausted or pending:
        batch: list[dict] = []
        nbytes = 0
        while pending and len(batch) < MAX_BATCH_RECORDS:
            sz = len(pending[0]["Data"]) + len(pending[0]["PartitionKey"])
            if nbytes + sz > MAX_BATCH_BYTES:
                break
            rec = pending.pop(0)
            batch.append(rec)
            nbytes += sz
        while not exhausted and len(batch) < MAX_BATCH_RECORDS:
            try:
                rec = next(it)
            except StopIteration:
                exhausted = True
                break
            sz = len(rec["Data"]) + len(rec["PartitionKey"])
            if sz > MAX_RECORD_BYTES:
                raise ValueError("record exceeds 1 MB Kinesis limit")
            if nbytes + sz > MAX_BATCH_BYTES:
                pending.append(rec)  # did not fit; goes in the next batch
                break
            batch.append(rec)
            nbytes += sz
        if not batch:
            break
        resp = client.put_records(StreamName=stream_name, Records=batch)
        if resp["FailedRecordCount"]:
            for rec, status in zip(batch, resp["Records"]):
                if "ErrorCode" in status:
                    pending.append(rec)
        delivered += len(batch) - resp["FailedRecordCount"]
    return delivered


def deliver_partitions(
    keyed: DataFrame, spool_dir: str, stream_name: str, batch_id: int, fail_every: int = 7
) -> None:
    """Executor-side Kinesis delivery (A-8..A-10 at cluster scale).

    ``keyed`` must have columns ``pk`` (string) and ``data`` (string).
    Every partition opens its own client and runs the chunked retrying
    writer over its partition iterator, so delivery parallelism equals
    the partition count and NOTHING is collected to the driver — the
    shape that survives 100 TB (upstream ``main.go:~60-100`` approx runs
    one Lambda per S3 object; here one task per partition). The stub
    spools to files keyed by (batch, partition) so local-mode output is
    collision-free and deterministic; a real ``boto3.client("kinesis")``
    needs no shared filesystem at all.
    """

    def _send(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        client = KinesisStubClient(
            spool_dir, fail_every=fail_every, prefix=f"b{batch_id:05d}_p{pid:05d}_"
        )
        put_records_chunked(
            client,
            stream_name,
            (
                {"Data": r["data"].encode("utf-8"), "PartitionKey": r["pk"] or "0"}
                for r in rows
            ),
        )

    keyed.foreachPartition(_send)


def deliver_events_to_spool(spark: SparkSession, sf_dir: str) -> str:
    """Run the full B-6 delivery path — events replayed as a file stream,
    JSON-serialized (partition key = user_id, A-10 analog), delivered
    through the executor-side chunked retrying writer — and return the
    spool dir the stub 'stream' now holds."""
    from cloudtrail_streamer_spark.streaming import harness

    replay = harness.write_replay_files(spark, sf_dir)
    stream = harness.read_replay_stream(spark, replay)
    spool = tempfile.mkdtemp(prefix="cts_kinesis_spool_")

    payload = F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value", "props"))

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.select(
            F.col("user_id").cast("string").alias("pk"), payload.alias("data")
        )
        deliver_partitions(keyed, spool, "cloudtrail-stream", batch_id)

    q = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cts_ckpt_sink_"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, "sink_foreachbatch_kinesis", 600.0)
    return spool


_DELIVERED_COUNTS_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@query("sink_foreachbatch_kinesis", oracle=_DELIVERED_COUNTS_ORACLE, survey_id="B-6")
def sink_foreachbatch_kinesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch Kinesis delivery of the events stream (stubbed sink):
    deliver through the chunked retrying writer, then read the spool back
    and count per event_type — equals the source counts despite injected
    partial failures (at-least-once, exactly-once here since the stub
    dedups by payload). Tier H since r10 (VERDICT r09 #5): the delivered
    per-type counts hash-compare against the source counts the oracle
    owns, so a dropped chunk, double delivery, or retry bug is a driver
    hash mismatch — the delivered-count certificate pattern."""
    spool = deliver_events_to_spool(spark, sf_dir)
    delivered = spark.read.json(spool)
    return (
        delivered.select(F.get_json_object("data", "$.event_type").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_IDEMPOTENT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
       CAST(COUNT(*) AS BIGINT) AS n_delivered,
       CAST(0 AS BIGINT) AS retry_delta
FROM events
"""


@query("sink_idempotent_batchid", oracle=_IDEMPOTENT_ORACLE, survey_id="B-6-ext")
def sink_idempotent_batchid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once via batchId-keyed idempotent commits (SURVEY §4.3:
    "foreachBatch sinks idempotent via batchId" — the upgrade over the
    reference's bare at-least-once retry, upstream ``main.go:~80-100``
    approx): each micro-batch writes to its own ``batch=<id>`` dir with
    mode=overwrite (a replayed half-written batch rewrites cleanly) and
    then drops a commit marker; a batch whose marker already exists is
    SKIPPED. After the stream drains, the query REPLAYS batch 0 through
    the same sink — simulating the checkpoint-recovery double-delivery
    — and certifies delivery didn't grow. H-tier certificate:
    (n_source, n_delivered, retry_delta=0) hash-checked against the
    events table."""
    import os
    import uuid

    from cloudtrail_streamer_spark.streaming import harness

    replay = harness.write_replay_files(spark, sf_dir)
    stream = harness.read_replay_stream(spark, replay)
    base = tempfile.mkdtemp(prefix="cts_idem_")

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(base, f"_COMMIT_{batch_id:05d}")
        if os.path.exists(marker):
            return  # already committed: replay is a no-op
        batch_df.write.mode("overwrite").json(
            os.path.join(base, f"batch={batch_id:05d}")
        )
        open(marker, "w").close()  # commit point (atomic create)

    q = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cts_ckpt_idem_"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, "sink_idempotent_batchid", 600.0)

    glob = os.path.join(base, "batch=*")
    before = spark.read.schema(harness.EVENTS_SCHEMA).json(glob).count()
    # Simulate checkpoint-recovery double delivery of batch 0.
    b0 = spark.read.schema(harness.EVENTS_SCHEMA).json(
        os.path.join(base, "batch=00000")
    )
    deliver(b0, 0)
    after = spark.read.schema(harness.EVENTS_SCHEMA).json(glob).count()

    src = table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    return src.select(
        "n_source",
        F.lit(before).cast("long").alias("n_delivered"),
        F.lit(after - before).cast("long").alias("retry_delta"),
    )


_FANOUT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
       CAST(COUNT(*) AS BIGINT) AS n_parquet,
       CAST(COUNT(*) AS BIGINT) AS n_spool
FROM events
"""


@query("sink_fanout_dual", oracle=_FANOUT_ORACLE, survey_id="B-6-ext")
def sink_fanout_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stream, TWO sinks from a single foreachBatch: each micro-batch
    lands in the analytical store (partitioned parquet — the lake copy)
    AND the operational spool (the Kinesis-stub forward — the reference's
    job) without reading the source twice. This is the standard
    lambda-architecture fanout; both writes happen inside the same batch
    function, so the checkpoint advances only when both succeeded —
    per-batch all-or-nothing without a distributed transaction. The
    certificate row proves neither fork lost or duplicated records."""
    import os

    from cloudtrail_streamer_spark.streaming import harness

    replay = harness.write_replay_files(spark, sf_dir)
    stream = harness.read_replay_stream(spark, replay)
    base = tempfile.mkdtemp(prefix="cts_fanout_")
    lake = os.path.join(base, "lake")
    spool = os.path.join(base, "spool")
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    )

    def fanout(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy("event_type").parquet(lake)
        keyed = batch_df.select(
            F.col("user_id").cast("string").alias("pk"), payload.alias("data")
        )
        deliver_partitions(keyed, spool, "cloudtrail-stream", batch_id)

    q = (
        stream.writeStream.foreachBatch(fanout)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cts_ckpt_fan_"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, "sink_fanout_dual", 600.0)

    n_parquet = spark.read.parquet(lake).count()
    n_spool = spark.read.json(spool).count()
    src = table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    return src.select(
        "n_source",
        F.lit(n_parquet).cast("long").alias("n_parquet"),
        F.lit(n_spool).cast("long").alias("n_spool"),
    )
