"""Skew-mitigation helpers (SURVEY.md §4.3: "skewed keys → salting or
AQE skew-join").

AQE's skew-join split handles sort-merge skew automatically (enabled in
session defaults); explicit salting is the tool when one key dominates a
*hash* shuffle so badly that a single task would own it — the classic
hot-user / hot-partition-key case in CloudTrail-shaped feeds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle split ``n_salt`` ways.

    The large side derives a DETERMINISTIC salt by hashing ``salt_from``
    (any column that varies within a key group — e.g. the fact table's
    primary key); the small side is replicated once per salt value. Each
    (key, salt) shuffle partition then holds ~1/n of the hot key's rows.
    Result is row-identical to ``large.join(small, key, how)`` (asserted
    in tests/test_engine.py).

    At 100 TB: use AFTER diagnosing skew (Spark UI task-time histogram);
    replication multiplies the small side's shuffle volume by n_salt.
    """
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salt)).cast("int")
    l = large.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(s, [key, "__salt"], how).drop("__salt")
