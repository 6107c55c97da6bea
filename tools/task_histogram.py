#!/usr/bin/env python
"""Per-stage task-skew histogram for one registry query — the guide
§2.5 max-vs-median diagnosis, headless (the bench sessions run with
spark.ui.enabled=false, so this reads the event log instead).

Runs the query once to the noop sink with spark.eventLog enabled, then
parses SparkListenerTaskEnd events: per stage, task count, duration
min/median/max, shuffle-read and output-records max/median. A stage
whose max/median duration ratio exceeds ~5x is skew worth fixing
(guide §2.5); also prints whether AQE split any partitions
(AQEShuffleRead skew counts are visible as stage task counts exceeding
the configured shuffle partitions).

Usage: python tools/task_histogram.py QUERY [--sf-dir DIR] [--top N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http_datafusion_spark.functions.pinning import pin_scope  # noqa: E402
from http_datafusion_spark.plans.registry import all_queries  # noqa: E402
from http_datafusion_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--top", type=int, default=12, help="print the N slowest stages")
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        "http_datafusion_spark-taskhist",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if args.query not in registry:
        sys.exit(f"unknown query {args.query!r}")
    with pin_scope():
        registry[args.query].spark(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.stop()  # flush the event log

    stages: dict[tuple[int, int], dict] = {}
    # Spark 4's v2 event log is a DIRECTORY of event files — walk it.
    logfiles = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(evdir)
        for f in files
        if "events" in f or f.startswith("local-")
    ]
    for lf in logfiles:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                rec = stages.setdefault(
                    key, {"durs": [], "sread": [], "swrite": [], "outrec": []}
                )
                rec["durs"].append(dur)
                rec["sread"].append(
                    (srm.get("Local Bytes Read", 0) or 0)
                    + (srm.get("Remote Bytes Read", 0) or 0)
                )
                rec["swrite"].append(swm.get("Shuffle Bytes Written", 0) or 0)
                rec["outrec"].append(
                    (tm.get("Output Metrics") or {}).get("Records Written", 0) or 0
                )

    rows = []
    for (sid, att), rec in stages.items():
        durs = sorted(rec["durs"])
        med = statistics.median(durs) if durs else 0.0
        rows.append(
            {
                "stage": sid,
                "attempt": att,
                "n_tasks": len(durs),
                "sum_sec": round(sum(durs), 3),
                "med_sec": round(med, 3),
                "max_sec": round(durs[-1], 3) if durs else 0.0,
                "skew_ratio": round(durs[-1] / med, 2) if med > 0 else None,
                "sread_max_mb": round(max(rec["sread"]) / 1e6, 2),
                "sread_med_mb": round(statistics.median(rec["sread"]) / 1e6, 2),
                "swrite_sum_mb": round(sum(rec["swrite"]) / 1e6, 2),
            }
        )
    rows.sort(key=lambda r: -r["sum_sec"])
    print(json.dumps({"query": args.query, "sf_dir": args.sf_dir, "n_stages": len(rows)}))
    for r in rows[: args.top]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
