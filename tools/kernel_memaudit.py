"""Decade-scale memory audit of the r11 bucketed pandas kernels
(VERDICT r11 #5): measure, per scale factor, the bucket count the
footer derives, the LARGEST slice any one kernel call receives, and the
peak RSS of the Python workers running the kernels — evidence that
per-kernel pandas memory stays bounded as data grows (the r11 builder
asserted it from the arithmetic; this measures it).

Read-only: runs SHADOW copies of the registered kernels (same bucketing
expression, same kernel body) instrumented to emit one
(bucket, n_rows, worker_maxrss_mb) row per kernel call. Run one sf per
process so worker reuse cannot carry ru_maxrss across scales:

    for d in sf0.1 .benchdata/sf1 .benchdata/sf10; do
        python tools/kernel_memaudit.py /root/testdata/$d; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.operators.udfs import _kernel_buckets, _zscore_bucket


def _rss_mb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kernel-memaudit")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = table(spark, sf_dir, "events")
    n_rows = ev.count()
    n_buckets = _kernel_buckets(sf_dir, "events")

    out: dict = {"sf_dir": sf_dir, "events_rows": n_rows, "n_buckets": n_buckets}

    # --- grouped map (udaf_applyinpandas shadow) ---
    def probe_zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        res = _zscore_bucket(pdf)  # the real kernel body
        return pd.DataFrame(
            {"n_rows": [len(pdf)], "maxrss_mb": [_rss_mb()], "n_out": [len(res)]}
        )

    t0 = time.perf_counter()
    cells = (
        ev.select("event_id", "user_id", "value")
        .groupBy(F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("_b"))
        .applyInPandas(probe_zscore, "n_rows long, maxrss_mb double, n_out long")
        .collect()
    )
    out["grouped_map"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "kernel_calls": len(cells),
        "max_rows_per_call": max(c["n_rows"] for c in cells),
        "mean_rows_per_call": round(sum(c["n_rows"] for c in cells) / len(cells)),
        "worker_peak_rss_mb": round(max(c["maxrss_mb"] for c in cells), 1),
        "rows_out": sum(c["n_out"] for c in cells),
    }

    # --- cogrouped asof (udaf_cogrouped_asof shadow) ---
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("_b")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", bucket
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", bucket
    )

    def probe_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        l = left.sort_values(["ts", "user_id"], kind="mergesort")
        r = right.sort_values(["ts", "user_id"], kind="mergesort")
        m = pd.merge_asof(l, r, on="ts", by="user_id", suffixes=("", "_p"))
        return pd.DataFrame(
            {
                "n_left": [len(left)],
                "n_right": [len(right)],
                "maxrss_mb": [_rss_mb()],
                "n_out": [len(m)],
            }
        )

    t0 = time.perf_counter()
    cells = (
        clicks.groupBy("_b")
        .cogroup(purchases.groupBy("_b"))
        .applyInPandas(
            probe_asof, "n_left long, n_right long, maxrss_mb double, n_out long"
        )
        .collect()
    )
    out["cogrouped_asof"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "kernel_calls": len(cells),
        "max_rows_per_call": max(c["n_left"] + c["n_right"] for c in cells),
        "worker_peak_rss_mb": round(max(c["maxrss_mb"] for c in cells), 1),
    }
    print("MEMAUDIT:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
