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


_COLUMN_STATS_CACHE: dict[tuple[str, str], tuple] = {}


def column_minmax(sf_dir: str, name: str, col: str):
    """(min, max) of ``col`` from parquet footer column statistics —
    metadata-only, memoized. The metastore analog at 100 TB; used to
    derive filter SELECTIVITY for cost-based hints (ADVICE r07: a
    hardcoded selectivity constant is wrong the moment the filter or
    the data distribution changes — footer min/max track both).

    Returns (None, None) when stats are missing/unreadable; callers
    must treat unknown as "use the safe default plan"."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (path, col)
    if key in _COLUMN_STATS_CACHE:
        return _COLUMN_STATS_CACHE[key]
    try:
        import pyarrow.parquet as pq

        files = []
        if os.path.isdir(path):
            for root, _dirs, fs in os.walk(path):
                files += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
        else:
            files = [path]
        lo = hi = None
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if col not in idx:
                return (None, None)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    return (None, None)  # one opaque group poisons the range
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out = (lo, hi)
    except Exception:
        return (None, None)
    _COLUMN_STATS_CACHE[key] = out
    return out


def avg_row_bytes(sf_dir: str, name: str) -> float:
    """Mean UNCOMPRESSED bytes per row from parquet footers — the
    byte-based input for broadcast-build sizing (a row-count cap alone
    lets a wide table blow past executor memory; ADVICE r07)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        files = []
        if os.path.isdir(path):
            for root, _dirs, fs in os.walk(path):
                files += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
        else:
            files = [path]
        rows = 0
        nbytes = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                nbytes += md.row_group(rg).total_byte_size
        return nbytes / rows if rows else -1.0
    except Exception:
        return -1.0
