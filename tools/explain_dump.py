#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Used for the optimization-round before/after plan evidence
(plans/r17/<query>_{before,after}.txt). Plan SHAPE is scale-independent,
so the default sf0.001 build is cheap; pins (localCheckpoint) execute
during plan construction, which is the same cost the scan audit pays.

Usage:
    python tools/explain_dump.py QUERY [QUERY ...] --out-dir plans/r17 \
        --suffix before [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http_datafusion_spark.plans.registry import all_queries  # noqa: E402
from http_datafusion_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    # Validate every name BEFORE paying Spark startup (r17 ADVICE): a
    # typo'd name used to raise a bare KeyError mid-loop with earlier
    # files already written.
    registry = all_queries()
    unknown = sorted(set(args.queries) - set(registry))
    if unknown:
        sys.exit(f"unknown queries (not in registry): {unknown}")
    spark = get_spark("http_datafusion_spark-explain")
    for name in args.queries:
        spec = registry[name]
        df = spec.spark(spark, args.sf_dir)
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
