#!/usr/bin/env python
"""Replicate a testdata scale-factor directory Nx for BENCH-ONLY runs.

Usage: python tools/scale_data.py [--src /root/testdata/sf0.1] [--out /tmp/sf1] [--factor 10]

Fact tables (orders, lineitem, events, documents, embeddings) are
replicated with their primary keys offset per copy so keys stay unique
and the orders<->lineitem join keeps its fan-out; dimension tables
(region, nation, customer, supplier, part) are copied as-is — the
classic fact-scales/dims-don't shape, which is also what makes the
broadcast-join strategy the right one to measure.

This data is for PERFORMANCE measurement only: correctness (the DuckDB
oracle gate) always runs on the driver-generated /root/testdata sets.
"""

from __future__ import annotations

import argparse
import os

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_KEY_OFFSETS = {
    # table -> columns to offset by copy_index * (max(key)+1) of the base
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in FACT_KEY_OFFSETS.items():
        path = f"{src}/{t}.parquet"
        (base,) = con.execute(f"SELECT max({keys[0]}) + 1 FROM '{path}'").fetchone()
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {base} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{path}' CROSS JOIN range({factor}) t(i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows (x{factor})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    scale(a.src, a.out, a.factor)
