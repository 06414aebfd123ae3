"""Table statistics for cost-based physical-plan choices (VERDICT r03 #8).

Spark's CBO (`spark.sql.cbo.enabled` + ANALYZE TABLE) reorders joins and
picks broadcast sides from per-table row counts and per-column NDVs. This
engine reads bare parquet directories (no metastore), so the equivalent
is computed here in two tiers:

- ``row_count``: free — summed from parquet footers (driver-side pyarrow
  metadata read, no Spark job). This is what a catalog/metastore would
  serve at 100 TB; operators use it for kernel routing (e.g.
  ``sim_search_topk`` picks the Arrow BLAS block kernel above the
  measured crossover and the codegen SQL plan below it) and broadcast
  decisions.
- ``analyze``: one Spark job per table — row count, per-column NDV
  (HyperLogLog approx, the same sketch ANALYZE uses), min/max, null
  count. Registered as the ``agg_cbo_stats`` query so the stats
  computation itself is driver-checked.

At 100 TB these numbers come from the metastore/ANALYZE, not a footer
walk — the point is the ROUTING CONTRACT: physical strategy is chosen
from O(1) metadata, never by materializing the data twice.
"""

from __future__ import annotations

import os

_ROW_COUNT_CACHE: dict[str, int] = {}


def row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footers — metadata-only, memoized.

    Falls back to -1 (unknown) if the path isn't a local parquet file or
    directory; callers must treat unknown as "use the safe default plan".
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _ROW_COUNT_CACHE.get(path)
    if cached is not None:
        return cached
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        else:
            n = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        # Do NOT cache the failure sentinel: a transient footer-read error
        # (or probing before a fixture exists) must not pin kernel routing
        # to the fallback path for the process lifetime (ADVICE r04).
        return -1
    _ROW_COUNT_CACHE[path] = n
    return n
