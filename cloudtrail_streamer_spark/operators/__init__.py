"""Operator modules — importing this package registers every query."""

from cloudtrail_streamer_spark.operators import (  # noqa: F401
    aggregates,
    joins,
    projection,
    scans,
    sorts_sets,
)
