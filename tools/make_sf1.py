"""Derive an sf1 benchmark dataset (10x sf0.1) for the marginal-scaling
bench column (VERDICT r04 next-#5).

The driver testdata stops at sf0.1, so one more decade of the scaling
curve needs a local derivation: each scaling table is replicated 10x
with every key domain shifted by rep * (max_key + 1), keeping join
integrity (lineitem rows of replica i join orders/part/supplier rows of
replica i) and growing GROUP COUNTS (new customers/users/docs per
replica) rather than group sizes, which is what a real 10x scale-up
does. nation/region stay fixed-size (TPC-H dims don't scale).

This is BENCH data only — correctness runs stay on the driver fixtures.
Output is written to a repo-local gitignored dir and built lazily (once
per checkout, ~10 s with DuckDB); a _DONE marker makes the build
idempotent and safe against a half-finished previous run.
"""

from __future__ import annotations

import os

SRC_DEFAULT = "/root/testdata/sf0.1"
OUT_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf1")

# table -> list of (column, key_domain); key domains shared across tables
_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}
_DOMAIN_SOURCE = {  # key domain -> (table, column) that defines its max
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
_COPY_ASIS = ("region", "nation")
_REPS = 10


def ensure_sf1(src: str = SRC_DEFAULT, out: str = OUT_DEFAULT) -> str | None:
    """Build the sf1 dir if missing; return its path (None on failure)."""
    marker = os.path.join(out, "_DONE")
    if os.path.isfile(marker):
        return out
    try:
        import duckdb

        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        offsets = {
            dom: con.execute(
                f"SELECT MAX({col}) + 1 FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchone()[0]
            for dom, (tbl, col) in _DOMAIN_SOURCE.items()
        }
        for t in _COPY_ASIS:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
        for t, shifts in _SHIFTS.items():
            shifted = {c: f"({c} + rep * {offsets[dom]}) AS {c}" for c, dom in shifts}
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
                ).fetchall()
            ]
            sel = ", ".join(shifted.get(c, c) for c in cols)
            con.execute(
                f"COPY (SELECT {sel} "
                f"FROM read_parquet('{src}/{t}.parquet'), "
                f"(SELECT UNNEST(RANGE({_REPS})) AS rep)) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
        con.close()
        with open(marker, "w") as f:
            f.write("ok\n")
        return out
    except Exception:
        return None


if __name__ == "__main__":
    print(ensure_sf1())
