"""Operator modules — importing this package registers every query."""

from cloudtrail_streamer_spark.operators import (  # noqa: F401
    aggregates,
    datasource_py,
    dedup,
    engine_ext,
    functions_ops,
    joins,
    lakehouse,
    multimodal,
    pipeline_ext,
    projection,
    relational_ext,
    scans,
    similarity,
    sorts_sets,
    stats_ops,
    tpch,
    tpch2,
    text,
    udfs,
    windows,
)
