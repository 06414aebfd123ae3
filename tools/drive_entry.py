"""Driver-sim: exercise __spark_entry__ exactly as the external harness does.

Fresh process, driver-owned plain SparkSession (no engine confs), every
queries()[name] at sf0.01 compared against oracle_sql()[name] in DuckDB.
Usage: python tools/drive_entry.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from tests.conftest import assert_frames_match, register_duckdb_views


def main() -> int:
    """Usage: drive_entry.py [sf_dir] [query_name ...]

    With query names, checks only those (fast iteration on a changed
    op); the no-args form is the full 250-query gate."""
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subset = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}")
    assert len(rows) >= 1

    qs, oracles = e.queries(), e.oracle_sql()
    if subset:
        unknown = subset - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        qs = {n: qs[n] for n in subset}
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    failed = []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf_dir).toPandas()
        # op-local persists otherwise accumulate across ~250 queries in
        # this long-lived session (ADVICE r03: memory pressure + LRU churn)
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"{name:32s} rows {len(sdf):>8} (R-tier, rows-only)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        try:
            assert_frames_match(sdf, odf, name)
            print(f"{name:32s} rows {len(sdf):>8} MATCH")
        except AssertionError as exc:
            failed.append(name)
            print(f"{name:32s} FAIL: {exc}")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries OK")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
