"""Streaming surface — the faithful replacement of the reference's
S3→Lambda→Kinesis pipeline (SURVEY.md §2.A A-2..A-11, §3.2).

Modules:
- harness: deterministic file-replay fixtures (hourly gzipped JSON) —
  the stand-in for CloudTrail's S3 deliveries.
- sources: file-stream + json.gz ingest (A-4..A-7 analogs).
- sinks: foreachBatch Kinesis writer with 500-record/5 MB chunking and
  partial-failure retry (A-8..A-10 analogs), boto3-shaped local stub.
- windows_stream: tumbling/sliding/session windows, watermark/late-data,
  stateful dedup and update-mode aggregation (B-45..B-50).
"""

from cloudtrail_streamer_spark.streaming import (  # noqa: F401
    cloudtrail,
    sinks,
    sources,
    spool_source,
    windows_stream,
)
