"""Benchmark harness (BASELINE.md §2): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], full materialization via the noop sink.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "duckdb": {...}, "ratio": {...}}

The duckdb/ratio keys time the same H-tier oracle SQL single-process on
the same parquet (the BASELINE "within 2×" comparison); R-tier headline
queries report Spark time only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_pruned",
    "agg_group_q1",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "top_n_per_group",
    "agg_rollup",
    "text_tfidf",
    "dedup_exact",
    "sim_search_topk",
    "stream_tumbling",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from cloudtrail_streamer_spark.session import get_session
    from cloudtrail_streamer_spark.registry import all_oracles, all_queries

    spark = get_session("cts-bench")
    queries, oracles = all_queries(), all_oracles()

    # Methodology (BASELINE.md §2): session start AND per-query plan
    # analysis/whole-stage-codegen compile are amortized — each query runs
    # once untimed (compile) then min-of-3 timed (hot). Min, not mean:
    # the host runs a periodic harness whose CPU spikes can inflate any
    # single run 10-30×; the minimum is the reproducible engine cost.
    # DuckDB gets the identical warm + min-of-3 protocol below.
    # Empty-job floor: min wall-clock of a 1-row noop action. At sf0.1
    # most headline queries are within ~2-4× of this constant — the
    # per-query ratios below measure Spark's scheduling floor, not the
    # operators (see BASELINE.md §2 "honest read").
    floor_df = spark.range(1)
    floor_df.write.format("noop").mode("overwrite").save()
    job_floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.format("noop").mode("overwrite").save()
        job_floor = min(job_floor, time.perf_counter() - t0)

    spark_times: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm: plan + codegen
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark_times[name] = round(best, 3)

    duck_times: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in HEADLINE:
            if name not in oracles:
                continue
            con.execute(oracles[name]).fetchall()  # warm (same protocol)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_times[name] = round(best, 3)
    except Exception:
        pass

    ratio = {
        n: round(spark_times[n] / duck_times[n], 2)
        for n in duck_times
        if duck_times[n] > 0
    }
    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(spark_times.values()), 3),
        "unit": "sec",
        "queries": spark_times,
        "sf": float(sf),
        "duckdb": duck_times,
        "ratio": ratio,
        "spark_job_floor_sec": round(job_floor, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
