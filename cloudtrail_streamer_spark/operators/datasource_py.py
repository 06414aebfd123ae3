"""Spark 4 Python DataSource with planning-time split pruning (B-1-ext).

The upstream reference's only "source" is an S3 object fetch inside a
Lambda (``main.go`` approx, SURVEY §2.A A-5/A-6). A Spark-native engine
exposes sources through the DataSource V2 API; Spark 4 extends that to
pure-Python sources (``pyspark.sql.datasource``) with real planner
integration: ``partitions()`` decides parallelism at planning time and
``pushFilters()`` lets the source consume predicates BEFORE any split
is read. This module exercises both with a deterministic CloudTrail-ish
event generator:

- every field is pure integer arithmetic on ``event_id`` (name, region,
  error flag), so a DuckDB ``range()`` query can mirror the generated
  relation exactly — the source is H-tier hash-checkable;
- ``aws_region`` is constant per split, so an ``EqualTo`` filter on it
  prunes whole splits at planning time (the generate/fetch work for
  pruned splits never runs — the same mechanism a 100 TB deployment
  uses to skip S3 prefixes/partitions at the source);
- ``read()`` yields pyarrow RecordBatches built from numpy vectors —
  Arrow-columnar transfer into the JVM, no per-row Python.

CONTRACT (learned the hard way in a probe): a filter NOT yielded back
from ``pushFilters`` is claimed, and Spark DELETES its Filter node — a
claimed-but-unapplied filter silently returns wrong rows. This reader
claims only ``EqualTo`` on ``aws_region`` and enforces it by split
pruning, which is exhaustive because region is split-constant. The
pushdown path needs ``spark.sql.python.filterPushdown.enabled`` (a
session.py RUNTIME_CONF); with it off, Spark keeps the Filter node and
results are identical, just unpruned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from cloudtrail_streamer_spark.streaming.harness import await_or_raise
from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

REGIONS = ["us-east-1", "us-west-2", "eu-west-1", "ap-south-1"]
EVENT_NAMES = [
    "AssumeRole",
    "GetObject",
    "PutObject",
    "DeleteObject",
    "ConsoleLogin",
    "CreateUser",
    "DescribeInstances",
]


class _CTGenSplit(InputPartition):
    def __init__(self, start: int, end: int, region: str):
        self.start = start
        self.end = end
        self.region = region


class _CTGenReader(DataSourceReader):
    """Deterministic generator reader. ``n_events`` ids are dealt into
    ``splits`` contiguous ranges; split ``s`` carries region
    ``REGIONS[s % 4]`` for every id in it."""

    def __init__(self, options):
        self.n_events = int(options.get("n_events", 64000))
        self.n_splits = int(options.get("splits", 8))
        self._region_eqs: set[str] = set()

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("aws_region",):
                # Claimed: region is split-constant, so pruning splits in
                # partitions() applies this predicate exhaustively (an
                # impossible value simply prunes every split).
                self._region_eqs.add(f.value)
            else:
                yield f  # unsupported — Spark keeps its Filter node

    def partitions(self):
        step = -(-self.n_events // self.n_splits)  # ceil
        out = []
        for s in range(self.n_splits):
            region = REGIONS[s % len(REGIONS)]
            if self._region_eqs and any(v != region for v in self._region_eqs):
                continue
            start = s * step
            end = min((s + 1) * step, self.n_events)
            if start < end:
                out.append(_CTGenSplit(start, end, region))
        return out

    def read(self, split: _CTGenSplit):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(split.start, split.end, dtype=np.int64)
        names = np.array(EVENT_NAMES, dtype=object)[ids % len(EVENT_NAMES)]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(names, type=pa.string()),
                pa.array([split.region] * len(ids), type=pa.string()),
                pa.array(ids * 60 + 1_704_067_200, type=pa.int64()),
                pa.array((ids % 13 == 0).astype(np.int32), type=pa.int32()),
            ],
            names=["event_id", "event_name", "aws_region", "epoch_s", "error_code"],
        )


class CloudTrailGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cloudtrail_gen"

    def schema(self) -> str:
        return (
            "event_id bigint, event_name string, aws_region string, "
            "epoch_s bigint, error_code int"
        )

    def reader(self, schema):
        return _CTGenReader(self.options)

    def simpleStreamReader(self, schema):
        return _CTGenStreamReader(self.options)


# DuckDB mirror of the generator arithmetic: 1-based list indexing over
# the same modulo scheme, step = ceil(64000/8) = 8000 ids per split.
_PYDS_ORACLE = """
WITH ev AS (
  SELECT r.range AS event_id,
         ['AssumeRole','GetObject','PutObject','DeleteObject',
          'ConsoleLogin','CreateUser','DescribeInstances']
           [(r.range % 7) + 1] AS event_name,
         ['us-east-1','us-west-2','eu-west-1','ap-south-1']
           [((r.range // 8000) % 4) + 1] AS aws_region,
         CASE WHEN r.range % 13 = 0 THEN 1 ELSE 0 END AS error_code
  FROM range(0, 64000) r
)
SELECT event_name,
       COUNT(*) AS n_events,
       CAST(SUM(error_code) AS BIGINT) AS n_errors,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id
FROM ev
WHERE aws_region = 'us-east-1'
GROUP BY event_name
ORDER BY event_name
"""


@query("source_python_datasource", oracle=_PYDS_ORACLE, survey_id="B-1-ext")
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the registered Python DataSource with a region predicate the
    source consumes at planning time: 6 of 8 splits are pruned before a
    single row is generated (pinned by a reader-level unit test in
    tests/test_engine.py). The surviving 16k rows arrive as Arrow
    batches and flow into a JVM-side hash aggregate. The oracle
    recomputes the identical relation from ``range()`` arithmetic —
    the full generate→prune→aggregate path is value-hash-checked.
    ``sf_dir`` is unused: the source generates its input, which is the
    point."""
    spark.dataSource.register(CloudTrailGenDataSource)
    df = (
        spark.read.format("cloudtrail_gen")
        .option("n_events", 64000)
        .option("splits", 8)
        .load()
    )
    return (
        df.where(F.col("aws_region") == "us-east-1")
        .groupBy("event_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("error_code").cast("long").alias("n_errors"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_name")
    )


# ---------------------------------------------------------------------------
# Streaming variant: SimpleDataSourceStreamReader + checkpoint resume
# ---------------------------------------------------------------------------


class _CTGenStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same generated relation.
    ``read(start)`` returns one chunk and the next offset; Spark
    checkpoints the offset, so a restarted query resumes mid-stream
    instead of re-reading — the exactly-once source contract."""

    def __init__(self, options):
        self.n_events = int(options.get("n_events", 2000))
        self.chunk = int(options.get("chunk", 700))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        if pos >= self.n_events:
            return iter([]), {"pos": pos}
        end = min(pos + self.chunk, self.n_events)
        rows = [
            (
                i,
                EVENT_NAMES[i % len(EVENT_NAMES)],
                REGIONS[(i // 500) % len(REGIONS)],
                1_704_067_200 + i * 60,
                int(i % 13 == 0),
            )
            for i in range(pos, end)
        ]
        return iter(rows), {"pos": end}


_SDS_ORACLE = """
WITH ev AS (
  SELECT r.range AS event_id,
         ['AssumeRole','GetObject','PutObject','DeleteObject',
          'ConsoleLogin','CreateUser','DescribeInstances']
           [(r.range % 7) + 1] AS event_name,
         CASE WHEN r.range % 13 = 0 THEN 1 ELSE 0 END AS error_code
  FROM range(0, 2000) r
)
SELECT event_name,
       COUNT(*) AS n_events,
       CAST(SUM(error_code) AS BIGINT) AS n_errors
FROM ev
GROUP BY event_name
ORDER BY event_name
"""


@query("stream_python_datasource", oracle=_SDS_ORACLE, survey_id="B-3-ext")
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the Python DataSource, driven to completion as
    a sequence of availableNow runs AGAINST ONE CHECKPOINT: each run
    consumes the reader's next prefetched chunk (700 ids), commits its
    offset, and stops; the next run restores both the source offset and
    the aggregation state from the checkpoint and continues — 2000 ids
    take ≥3 restart cycles, so the final complete-mode counts prove
    offset commit AND state-store recovery end to end, not just a
    single lucky batch. The final per-event-name aggregate is
    chunking-independent, which is what makes this H-tier: the oracle
    recomputes it from ``range()`` arithmetic with no knowledge of how
    many cycles ran. sf_dir is unused (generated source)."""
    import shutil

    from cloudtrail_streamer_spark.catalog import scratch_dir
    from cloudtrail_streamer_spark.session import configure

    configure(spark)
    spark.dataSource.register(CloudTrailGenDataSource)
    root = scratch_dir("stream_python_datasource", sf_dir)
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)  # fresh stream per invocation
    sink = f"sds_out_{os.getpid()}"
    n_total, max_cycles = 2000, 8
    for _ in range(max_cycles):
        q = (
            spark.readStream.format("cloudtrail_gen")
            .option("n_events", n_total)
            .option("chunk", 700)
            .load()
            .groupBy("event_name")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("error_code").cast("long").alias("n_errors"),
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "datasource_py_stream", 120.0)
        q.stop()
        got = spark.sql(f"SELECT SUM(n_events) FROM {sink}").collect()[0][0] or 0
        if got >= n_total:
            break
    return (
        spark.table(sink)
        .select("event_name", "n_events", F.col("n_errors").cast("long").alias("n_errors"))
        .orderBy("event_name")
    )


# ---------------------------------------------------------------------------
# Batch writer: V2 commit protocol with Kinesis-style delivery caps
# ---------------------------------------------------------------------------


class _ChunkCommit(WriterCommitMessage):
    """Per-task delivery receipt (must be picklable)."""

    def __init__(self, chunks: list[tuple[int, int]]):
        self.chunks = chunks  # [(n_records, n_bytes), ...]


class _KinesisStubWriter(DataSourceWriter):
    """Executor-side chunked delivery with the upstream forwarder's
    limits (A-8: ≤500 records and ≤5 MB per PutRecords call — here a
    256 KiB test-scale byte cap, same mechanism). ``write`` flushes a
    gzipped JSON-lines chunk whenever EITHER cap would overflow and
    returns the per-chunk receipts; the driver-side ``commit`` runs
    once, only if every task succeeded — the transactional half the
    upstream Lambda lacks. ``abort`` removes this attempt's files, so a
    retried job cannot double-deliver."""

    RECORD_CAP = 500
    BYTE_CAP = 256 * 1024

    def __init__(self, options):
        self.path = options.get("path")
        self.run_id = options.get("run_id", "r0")

    def write(self, iterator):
        import gzip
        import json
        import os
        import uuid

        chunks: list[tuple[int, int]] = []
        buf: list[bytes] = []
        nbytes = 0

        def flush():
            nonlocal buf, nbytes
            if not buf:
                return
            name = os.path.join(
                self.path, f"chunk_{self.run_id}_{uuid.uuid4().hex}.json.gz"
            )
            with gzip.open(name, "wb") as fh:
                fh.writelines(buf)
            chunks.append((len(buf), nbytes))
            buf, nbytes = [], 0

        for row in iterator:
            rec = (json.dumps(row.asDict(), default=str) + "\n").encode()
            if buf and (
                len(buf) >= self.RECORD_CAP or nbytes + len(rec) > self.BYTE_CAP
            ):
                flush()
            buf.append(rec)
            nbytes += len(rec)
        flush()
        return _ChunkCommit(chunks)

    def commit(self, messages):
        import json
        import os

        chunks = [c for m in messages if m is not None for c in m.chunks]
        with open(os.path.join(self.path, f"_MANIFEST_{self.run_id}.json"), "w") as fh:
            json.dump(
                {
                    "n_chunks": len(chunks),
                    "n_records": sum(c[0] for c in chunks),
                    "max_chunk_records": max((c[0] for c in chunks), default=0),
                    "max_chunk_bytes": max((c[1] for c in chunks), default=0),
                },
                fh,
            )

    def abort(self, messages):
        import glob
        import os

        for f in glob.glob(os.path.join(self.path, f"chunk_{self.run_id}_*.json.gz")):
            os.remove(f)


class KinesisStubSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_stub"

    def writer(self, schema, overwrite: bool):
        return _KinesisStubWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _KinesisStubStreamWriter(self.options)


@query("sink_python_datasource_writer", survey_id="B-6-ext")  # Tier R
def sink_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliver the events table through the Python DataSourceWriter and
    certify the V2 commit protocol end to end: per-task ``write`` chunks
    rows under the A-8 caps and returns receipts, the driver ``commit``
    folds every receipt into ONE manifest (written exactly once, after
    all tasks succeed), and the certificate re-reads BOTH sides —
    manifest totals vs the delivered gzip files re-parsed through the
    engine's own json.gz source path. Rows-only driver tier (chunk
    boundaries depend on physical partitioning); the INVARIANTS the row
    carries are exact: delivered records == source rows, every chunk
    within both caps, chunk count consistent with the caps."""
    import glob
    import json as _json

    from cloudtrail_streamer_spark.catalog import scratch_dir
    from cloudtrail_streamer_spark.session import configure

    configure(spark)
    spark.dataSource.register(KinesisStubSink)
    out = os.path.join(scratch_dir("sink_python_datasource_writer", sf_dir), "delivery")
    os.makedirs(out, exist_ok=True)
    for f in glob.glob(os.path.join(out, "*")):
        os.remove(f)  # fresh delivery per invocation

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    n_src = ev.count()
    ev.write.format("kinesis_stub").option("path", out).option(
        "run_id", str(os.getpid())
    ).mode("append").save()

    with open(
        os.path.join(out, f"_MANIFEST_{os.getpid()}.json")
    ) as fh:
        man = _json.load(fh)
    redelivered = spark.read.json(
        os.path.join(out, "*.json.gz"), schema="event_id LONG, event_type STRING, value DOUBLE"
    )
    n_redelivered = redelivered.count()
    return spark.createDataFrame(
        [
            (
                int(man["n_chunks"]),
                int(man["n_records"]),
                int(man["max_chunk_records"]),
                int(man["max_chunk_bytes"]),
                bool(man["n_records"] == n_src == n_redelivered),
                bool(man["max_chunk_records"] <= _KinesisStubWriter.RECORD_CAP),
                bool(man["max_chunk_bytes"] <= _KinesisStubWriter.BYTE_CAP),
            )
        ],
        "n_chunks long, n_records long, max_chunk_records long, "
        "max_chunk_bytes long, records_match boolean, record_cap_ok boolean, "
        "byte_cap_ok boolean",
    )


# ---------------------------------------------------------------------------
# Streaming writer: per-epoch commit, idempotent on batch replay
# ---------------------------------------------------------------------------


class _KinesisStubStreamWriter(_KinesisStubWriter, DataSourceStreamWriter):
    """The streaming half of the sink: ``write`` (inherited) chunks each
    micro-batch partition under the same caps; ``commit(messages,
    batchId)`` writes ONE epoch manifest per batch and — the
    exactly-once upgrade — refuses to re-commit an epoch whose manifest
    already exists, so a batch replayed after a crash between sink
    commit and checkpoint write cannot double-deliver (the manual
    idempotent-by-batchId logic of streaming/sinks.py, expressed
    through the engine-level V2 protocol instead of user foreachBatch
    code)."""

    def commit(self, messages, batchId: int):  # noqa: N803 (Spark API name)
        import json
        import os

        man = os.path.join(self.path, f"_EPOCH_{batchId}.json")
        if os.path.exists(man):
            return  # replayed epoch: already delivered, drop duplicates
        chunks = [c for m in messages if m is not None for c in m.chunks]
        with open(man, "w") as fh:
            json.dump(
                {
                    "batch_id": batchId,
                    "n_chunks": len(chunks),
                    "n_records": sum(c[0] for c in chunks),
                    "max_chunk_records": max((c[0] for c in chunks), default=0),
                    "max_chunk_bytes": max((c[1] for c in chunks), default=0),
                },
                fh,
            )

    def abort(self, messages, batchId: int):  # noqa: N803
        _KinesisStubWriter.abort(self, messages)


@query("sink_python_stream_writer", survey_id="B-6-ext")  # Tier R
def sink_python_stream_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python source INTO Python sink, streaming end to end: the
    cloudtrail_gen stream (offset-checkpointed 700-id chunks) written
    through the kinesis_stub streaming writer across repeated
    availableNow restarts of ONE checkpoint. Every restart resumes from
    the committed source offset and delivers its batches through the
    per-epoch commit protocol. The certificate re-reads the delivered
    gzip records and the epoch manifests: zero duplicate event_ids
    (exactly-once across ≥3 restarts), manifest totals == delivered ==
    generated domain, caps held per chunk, one manifest per epoch.
    Rows-only driver tier (epoch/chunk boundaries are physical)."""
    import glob
    import json as _json

    from cloudtrail_streamer_spark.catalog import scratch_dir
    from cloudtrail_streamer_spark.session import configure

    configure(spark)
    spark.dataSource.register(CloudTrailGenDataSource)
    spark.dataSource.register(KinesisStubSink)
    root = scratch_dir("sink_python_stream_writer", sf_dir)
    out = os.path.join(root, "delivery")
    ckpt = os.path.join(root, "ckpt")
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    n_total, max_cycles, cycles = 2000, 8, 0
    for _ in range(max_cycles):
        q = (
            spark.readStream.format("cloudtrail_gen")
            .option("n_events", n_total)
            .option("chunk", 700)
            .load()
            .writeStream.format("kinesis_stub")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "datasource_py_cycles", 120.0)
        q.stop()
        cycles += 1
        mans = [
            _json.load(open(f))
            for f in glob.glob(os.path.join(out, "_EPOCH_*.json"))
        ]
        if sum(m["n_records"] for m in mans) >= n_total:
            break

    delivered = spark.read.json(
        os.path.join(out, "*.json.gz"),
        schema="event_id LONG, event_name STRING, aws_region STRING, "
        "epoch_s LONG, error_code INT",
    )
    agg = delivered.agg(
        F.count(F.lit(1)).alias("n_delivered"),
        F.count_distinct("event_id").alias("n_distinct"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                int(len(mans)),
                int(cycles),
                int(sum(m["n_records"] for m in mans)),
                int(agg["n_delivered"]),
                int(agg["n_distinct"]),
                bool(agg["n_delivered"] == agg["n_distinct"] == n_total),
                bool(
                    max((m["max_chunk_records"] for m in mans), default=0)
                    <= _KinesisStubWriter.RECORD_CAP
                ),
            )
        ],
        "n_epochs long, n_restarts long, manifest_records long, "
        "n_delivered long, n_distinct long, exactly_once boolean, "
        "record_cap_ok boolean",
    )
