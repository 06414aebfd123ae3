"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (JVM codegen, no UDF; SURVEY.md §4.2 vector row).

All arithmetic in DOUBLE after an explicit element cast, folded
left-to-right — the same evaluation DuckDB's list_* functions use, so
H-tier oracles stay exact (§5.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product: zip_with multiply + sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|) — formula mirrored verbatim in oracle SQL."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
