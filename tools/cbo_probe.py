#!/usr/bin/env python
"""CBO probe — does Catalyst's cost-based optimizer (ANALYZE TABLE
stats + spark.sql.cbo.enabled + joinReorder) find the join orders we
hand-coded in q5/q10, and does it change plans at bench scale?

Spark's CBO only reads stats from CATALOG tables, not temp views over
parquet, so this probe registers the star schema as external catalog
tables, runs ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS, and
compares the optimized plans/timings of q5/q7/q10-shaped SQL with CBO
on vs off. Findings land in BASELINE.md.

Usage: python tools/cbo_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http_datafusion_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""

Q10 = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

Q7 = """
SELECT supp_nation, cust_nation, yr, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS yr,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, yr
"""


def time_query(spark, sql: str, runs: int = 3) -> float:
    spark.sql(sql).count()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.sql(sql).count()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    spark = get_spark("cbo-probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.createTable(t, path=os.path.join(sf_dir, f"{t}.parquet"), source="parquet")

    print("== analyzing tables ==", flush=True)
    t0 = time.perf_counter()
    for t in TABLES:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    print(f"analyze wall: {time.perf_counter() - t0:.1f}s", flush=True)

    for name, sql in (("q5", Q5), ("q7", Q7), ("q10", Q10)):
        results = {}
        for cbo in ("false", "true"):
            spark.conf.set("spark.sql.cbo.enabled", cbo)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
            spark.conf.set("spark.sql.statistics.histogram.enabled", cbo)
            results[cbo] = time_query(spark, sql)
            joins = [
                ln.strip()
                for ln in spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString().split("\n")
                if "Join" in ln
            ]
            print(f"{name} cbo={cbo}: {results[cbo]:.2f}s  joins:")
            for j in joins:
                print(f"    {j[:140]}")
        print(f"{name}: cbo_off={results['false']:.2f}s cbo_on={results['true']:.2f}s", flush=True)

    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
