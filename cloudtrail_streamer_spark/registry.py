"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2.B registers here with a name, a
``(spark, sf_dir) -> DataFrame`` callable, and (for H-tier ops) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` is a thin re-export
of this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => Tier R (rows-only check)
    tier: str  # "H" or "R"
    survey_id: str  # e.g. "B-20"


def query(
    name: str, *, oracle: str | None = None, survey_id: str = "", tier: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. Tier defaults to H when oracle SQL is given."""

    def deco(fn: QueryFn) -> QueryFn:
        t = tier or ("H" if oracle is not None else "R")
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tier=t, survey_id=survey_id)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so registrations run."""
    import cloudtrail_streamer_spark.operators  # noqa: F401
    import cloudtrail_streamer_spark.streaming  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
