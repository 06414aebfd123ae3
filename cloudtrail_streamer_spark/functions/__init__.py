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


def cents(col: Column | str, scale: int = 2) -> Column:
    """Fixed-point integer representation of a scale-exact double.

    ``round(x·10^s)`` of a value generated at s decimal places lands
    within ~1e-9 of an integer on both engines — no rounding-tie risk —
    and BIGINT arithmetic is an order of magnitude faster than Spark's
    Decimal path (measured: Q1 1.33s → 0.3s at sf0.1). The emitted
    double equals the decimal formulation bit-for-bit (same exact
    rational, one final nearest-double cast), so DECIMAL-form oracle SQL
    remains valid.
    """
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * (10 ** scale)
    # ±0.5-then-truncate instead of round(): Spark's Round on double goes
    # through BigDecimal per row (~2× slower, measured); the input is
    # within ~1e-9 of an integer so both forms yield the same BIGINT.
    return (
        F.when(scaled >= 0, (scaled + 0.5).cast("long"))
        .otherwise((scaled - 0.5).cast("long"))
    )


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact fixed-point sum emitted as DOUBLE (cross-engine stable)."""
    return (F.sum(cents(col, scale)).cast("double") / (10 ** scale)).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact fixed-point sum / count as double divisions."""
    return (
        (F.sum(cents(col, scale)).cast("double") / (10 ** scale)) / F.count(F.lit(1))
    ).alias(alias)


def bsum(col: Column | str, alias: str) -> Column:
    """Integer sum pinned to BIGINT (DuckDB sums ints to HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def fround(c: Column, alias: str, nd: int = 4) -> Column:
    """Round an unavoidable float output to nd places (both engines)."""
    return F.round(c, nd).alias(alias)
