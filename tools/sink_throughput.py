"""Measure the foreachBatch chunked Kinesis writer's throughput
(VERDICT r06 #8 — BASELINE §1 row "Kinesis per-shard ingest: 1 MB/s or
1000 rec/s" had no measured engine-side number).

Two numbers, printed as one JSON line and recorded in BASELINE.md
§Measured:

1. ``writer_kernel_rec_s``: ``put_records_chunked`` alone on ONE
   partition's iterator (the per-shard analog — a real deployment runs
   one writer per partition/shard). Measured over the sf0.1 events
   payloads with the deterministic every-7th-record first-attempt
   failure ON, so the number includes the retry path. This is the
   engine-side ceiling per partition; the AWS 1000 rec/s shard cap, not
   this, binds in production.
2. ``e2e_stream_rec_s``: the full B-6 path — file-stream replay →
   foreachBatch → executor-side per-partition chunked delivery —
   wall-clock from stream start to drain, all records counted. Includes
   Spark micro-batch scheduling (30 day-files = 30 batches), JSON
   serialization, and spool I/O.

Protocol: local[$SPARK_GRAFT_CPUS], sf0.1 (100k events), min-of-3 for
the kernel, single run for the e2e stream (checkpoint semantics make
re-runs non-identical).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from cloudtrail_streamer_spark.catalog import table
    from cloudtrail_streamer_spark.session import get_session
    from cloudtrail_streamer_spark.streaming.sinks import (
        KinesisStubClient,
        deliver_events_to_spool,
        put_records_chunked,
    )

    spark = get_session("cts-sink-bench")

    # --- kernel: one partition's worth of records through the writer ---
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    rows = (
        table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("pk"), payload.alias("data"))
        .collect()  # bench-only: materialize once so the timer sees ONLY the writer
    )
    records = [
        {"Data": r["data"].encode("utf-8"), "PartitionKey": r["pk"]} for r in rows
    ]
    n = len(records)
    nbytes = sum(len(r["Data"]) for r in records)
    kernel_best = float("inf")
    for _ in range(3):
        spool = tempfile.mkdtemp(prefix="cts_sinkbench_")
        client = KinesisStubClient(spool, fail_every=7)
        t0 = time.perf_counter()
        delivered = put_records_chunked(client, "bench-stream", iter(records))
        kernel_best = min(kernel_best, time.perf_counter() - t0)
        if delivered != n:
            raise ValueError((delivered, n))

    # --- end-to-end: replay stream -> foreachBatch -> spool ---
    t0 = time.perf_counter()
    spool = deliver_events_to_spool(spark, sf_dir)
    e2e_sec = time.perf_counter() - t0
    n_delivered = spark.read.json(spool).count()
    if n_delivered != n:
        raise ValueError((n_delivered, n))

    print(
        json.dumps(
            {
                "metric": "sink_throughput",
                "sf_dir": sf_dir,
                "n_records": n,
                "payload_mb": round(nbytes / 1e6, 1),
                "writer_kernel_sec": round(kernel_best, 3),
                "writer_kernel_rec_s": round(n / kernel_best),
                "writer_kernel_mb_s": round(nbytes / 1e6 / kernel_best, 1),
                "e2e_stream_sec": round(e2e_sec, 3),
                "e2e_stream_rec_s": round(n / e2e_sec),
                "retry_path": "on (fail_every=7 first attempts)",
            }
        )
    )


if __name__ == "__main__":
    main()
