#!/usr/bin/env python
"""Benchmark harness — runs the headline (bench-tagged) queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed to full materialization (count of the result),
median of RUNS warm runs after one cold run that pays JVM/codegen
warmup. Set BENCH_QUERIES=name1,name2 to restrict, BENCH_RUNS=n to
change repetitions.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from http_datafusion_spark.plans.registry import all_queries  # noqa: E402
from http_datafusion_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark("http_datafusion_spark-bench")

    registry = all_queries()
    only = os.environ.get("BENCH_QUERIES")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
    else:
        names = sorted(n for n, spec in registry.items() if "bench" in spec.tags)

    timings: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        spec.spark(spark, sf_dir).count()  # cold run: warmup + plan cache
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
