#!/usr/bin/env python
"""Ad-hoc operator timing with the HONEST sink — bench.py's noop-write
runner exposed for one-off spot checks.

Why this tool exists: timing ``.count()`` (or ``.collect()`` on a 1-row
audit) lets Catalyst prune every expression the count doesn't need —
the same mistake was made twice (r3 bench, r10 spot-check tables), the
second time under-reporting a 247 s kernel as 2.8 s. A noop-format
write evaluates every output column on every row and discards the
bytes, so it is the only admissible ad-hoc timing (BASELINE.md "honest
sink" note). This tool shares bench.py's exact materialization +
warmup + median protocol, so spot-check numbers are comparable to
driver BENCH lines at the same sf.

Usage:
    python tools/spot_check.py QUERY [QUERY ...] [--sf-dir DIR]
        [--runs N] [--warmups N] [--cpus N]

Prints one JSON line per query:
    {"query": name, "sf_dir": dir, "median_sec": m, "band": [min, m, max],
     "runs": n, "warmups": w}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http_datafusion_spark.functions.pinning import pin_scope  # noqa: E402
from http_datafusion_spark.plans.registry import all_queries  # noqa: E402
from http_datafusion_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    """bench.py's honest sink: full evaluation, zero driver transfer."""
    df.write.format("noop").mode("overwrite").save()


def spot_check(spark, name: str, sf_dir: str, runs: int, warmups: int) -> dict:
    # pin_scope releases each execution's pinned blocks OUTSIDE the
    # timed region (bench.py's protocol) so back-to-back samples don't
    # accumulate executor storage.
    spec = all_queries()[name]
    for _ in range(warmups):
        with pin_scope():
            materialize(spec.spark(spark, sf_dir))
    samples = []
    for _ in range(runs):
        with pin_scope():
            t0 = time.perf_counter()
            materialize(spec.spark(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
    med = round(statistics.median(samples), 4)
    return {
        "query": name,
        "sf_dir": sf_dir,
        "median_sec": med,
        "band": [round(min(samples), 4), med, round(max(samples), 4)],
        "runs": runs,
        "warmups": warmups,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+", help="registry query names")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("http_datafusion_spark-spotcheck", cpus=args.cpus)
    registry = all_queries()
    unknown = [q for q in args.queries if q not in registry]
    if unknown:
        ap.error(f"unknown queries: {unknown}")
    for name in args.queries:
        print(json.dumps(spot_check(spark, name, args.sf_dir, args.runs, args.warmups)))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
