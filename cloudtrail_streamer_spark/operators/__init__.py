"""Operator modules — importing this package registers every query."""

from cloudtrail_streamer_spark.operators import aggregates  # noqa: F401
