"""Per-batch duration breakdown for the streaming replay harness.

Runs one (or more) replay-based streaming shapes and prints each
micro-batch's ``durationMs`` components (queryPlanning, addBatch,
getBatch, latestOffset, walCommit, commitOffsets, triggerExecution) so
the AvailableNow per-batch constant can be attributed instead of
guessed (guide §1: measure first). Read-only: builds its own session
and fixtures, changes nothing the registry sees.

Usage: python tools/stream_profile.py [sf_dir] [shape ...]
Shapes: agg (tumbling window agg), custom (applyInPandasWithState),
dedup (dropDuplicates), plain (stateless projection).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.streaming import harness


def shape_df(spark, name: str, replay: str):
    stream = harness.read_replay_stream(spark, replay)
    if name == "plain":
        return stream.select("event_id", "user_id", "value"), "append"
    if name == "agg":
        df = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
        )
        return df, "append"
    if name == "dedup":
        df = stream.withWatermark("ts", "2 days").dropDuplicates(["event_id"])
        return df.groupBy().count(), "complete"
    if name == "custom":
        from pyspark.sql.streaming.state import GroupStateTimeout

        from cloudtrail_streamer_spark.streaming.windows_stream import (
            _running_user_state,
        )

        df = (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_user_state,
                outputStructType="user_id LONG, n LONG, total_value DOUBLE",
                stateStructType="n LONG, cents LONG",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        return df, "update"
    raise SystemExit(f"unknown shape {name}")


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    shapes = argv[1:] or ["plain", "agg", "custom"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-profile")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    replay = harness.write_replay_files(spark, sf_dir)
    print(f"replay dir: {replay} ({len(os.listdir(replay))} files)")

    import tempfile
    import uuid

    for shape in shapes:
        df, mode = shape_df(spark, shape, replay)
        n = harness.suggest_stream_partitions(replay, spark)
        prior = spark.conf.get("spark.sql.shuffle.partitions", None)
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "PROFILE_PROVIDER",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            ),
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        for k, v in json.loads(os.environ.get("PROFILE_EXTRA_CONF", "{}")).items():
            spark.conf.set(k, str(v))
        ckpt = tempfile.mkdtemp(prefix=f"prof_ckpt_{shape}_")
        qname = f"prof_{shape}_{uuid.uuid4().hex[:6]}"
        t0 = time.monotonic()
        q = (
            df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.monotonic() - t0
        keys = [
            "triggerExecution",
            "queryPlanning",
            "getBatch",
            "latestOffset",
            "addBatch",
            "walCommit",
            "commitOffsets",
            "getOffset",
        ]
        tot: dict[str, int] = {}
        rows = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json)
            d = p.get("durationMs") or {}
            rows.append((p.get("batchId"), p.get("numInputRows"), d))
            for k in d:
                tot[k] = tot.get(k, 0) + d[k]
        print(f"\n=== shape={shape} wall={wall:.2f}s batches={len(rows)} ===")
        print("totals(ms):", {k: tot.get(k, 0) for k in keys if k in tot})
        other = tot.get("triggerExecution", 0) - sum(
            tot.get(k, 0) for k in keys[1:] if k in tot
        )
        print(f"trigger-minus-parts (unattributed) total: {other} ms")
        mid = rows[len(rows) // 2][2] if rows else {}
        print("median-batch durationMs:", mid)
        if prior is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
