"""Determinism-preserving expression helpers (SURVEY.md §5.3).

Cross-engine (Spark vs DuckDB) float stability is engineered, not hoped
for:

- Money math runs in DECIMAL(18,2): parquet doubles cast to decimal
  (identical nearest-double inputs on both engines → identical decimal),
  summed exactly, and only then cast back to DOUBLE for output. The final
  cast is the IEEE nearest-double of the same exact decimal on both
  engines → bit-identical.
- Averages are expressed as exact-decimal-sum / count in DOUBLE (one IEEE
  division, same operands both engines) — never engine-native AVG over
  doubles (summation order varies under parallelism).
- Every ranking/top-k carries a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast a (money/quantity) double column to exact decimal.

    ONLY cast raw generated columns (known to be exact at `scale`), never
    computed doubles: cast of an arbitrary double to decimal rounds
    differently across engines (Spark exact-BigDecimal HALF_UP vs DuckDB
    scaled-double rounding). Compute in decimal instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum emitted as DOUBLE (cross-engine stable)."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum / count as a single double division."""
    return (F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))).alias(alias)


def bsum(col: Column | str, alias: str) -> Column:
    """Integer sum pinned to BIGINT (DuckDB sums ints to HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def fround(c: Column, alias: str, nd: int = 4) -> Column:
    """Round an unavoidable float output to nd places (both engines)."""
    return F.round(c, nd).alias(alias)
