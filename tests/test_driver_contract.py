"""Guards on the two artifacts the round driver consumes directly:
``__spark_entry__`` (entry/queries/oracle_sql shape) and ``bench.py``
(one parseable JSON line on stdout).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_entry_contract(spark):
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 90
    assert set(osql) <= set(qs)
    # The driver's correctness gate walks registration order and
    # empirically checks the first ~50 entries: that window must hold
    # the declared PRIORITY head (never-driver-checked names + this
    # round's changed operators), in order. The upper bound is a HARD
    # <= 50: round 3 shipped q_bucketed_join at PRIORITY position 51
    # and the driver silently recorded only 50 rows — window occupancy
    # must be load-bearing, not hopeful.
    from http_datafusion_spark.plans.registry import PRIORITY

    assert 40 <= len(PRIORITY) <= 50
    assert list(qs)[: len(PRIORITY)] == list(PRIORITY)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    df = E.entry(spark)
    assert df.count() > 0 and len(df.schema.fields) > 1


def test_bench_final_line_is_compact_headline_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_QUERIES="q6_revenue_delta",
        BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        check=True,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    # Every stdout line must parse as JSON on its own (the driver's
    # bounded tail capture may land anywhere), and the LAST line is the
    # compact headline contract — no band (BENCH_r04's parsed:null came
    # from the band outgrowing the capture window).
    for l in lines:
        json.loads(l)
    payload = json.loads(lines[-1])
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert "q6_revenue_delta" in payload["queries"]
    assert "band" not in payload
    assert payload["sf"] == 0.001


def test_bench_headline_line_stays_inside_tail_capture():
    # The full 27-query headline line must stay well under the driver's
    # tail-capture window. Reconstruct the worst-case final line from
    # the real bench set with pessimistic 4-digit-second timings and
    # bound its length. (r04's band-bearing line measured ~2.9 KB and
    # was truncated; the compact line must keep ample margin.)
    from http_datafusion_spark.plans.registry import all_queries

    bench = sorted(n for n, s in all_queries().items() if "bench" in s.tags)
    fake = {
        "metric": "headline_queries_total_sec",
        "value": 9999.1234,
        "unit": "sec",
        "queries": {n: 9999.1234 for n in bench},
        "value_min": 9999.1234,
        "runs": 5,
        "sf": 0.1,
    }
    assert len(json.dumps(fake)) < 1200, "headline JSON line too long for tail capture"


def test_bench_set_is_oracle_checked_and_stable():
    # BASELINE.md's headline pair is a 27-query set; bench_proxy.py runs
    # each query's oracle, so every bench row must have one. Changing
    # the set deliberately means re-recording the pair in BASELINE.md —
    # this pin makes that an explicit step, not an accident.
    from http_datafusion_spark.plans.registry import all_queries

    qs = all_queries()
    bench = {n for n, s in qs.items() if "bench" in s.tags}
    assert len(bench) == 27, f"bench set changed: {sorted(bench)}"
    assert all(qs[n].oracle for n in bench)


def test_no_evidence_rows_are_in_window():
    """Evidence-age policy (BASELINE.md r12): every registry row with
    no driver-green CORRECTNESS record yet must sit in the CURRENT
    priority window — a new operator cannot silently skip the driver
    gate. (The age-alert half lives in tools/evidence_age.py, kept out
    of CI so a driver outage can't retroactively fail the suite.)"""
    from http_datafusion_spark.plans.registry import PRIORITY, all_queries
    from tools.evidence_age import latest_green_rounds

    latest, _ = latest_green_rounds()
    names = list(all_queries())
    never = [n for n in names if n not in latest]
    window = set(PRIORITY)
    uncovered = [n for n in never if n not in window]
    assert not uncovered, (
        f"registry rows with no driver evidence missing from the "
        f"priority window: {uncovered}"
    )
