"""Evidence-age report for the driver-correctness rotation.

The registry (the report derives the live row count from the
artifacts it parses — one canonical number per run, never hardcoded
here) outgrew the driver's ~50-row
correctness window around r10, so every row's driver evidence ages
until its re-confirmation slot comes around. This tool makes that
debt VISIBLE and POLICED (r11 verdict task 3, option b — the
formalize-the-carry choice):

- parse every CORRECTNESS_r*.json, record each row's latest
  ALL-GREEN round (rows_match + schema_match + hash_match where the
  hash field exists);
- print the evidence-age histogram (round -> #rows whose newest green
  is that round) and the rows with NO driver evidence at all;
- flag every row whose evidence is older than EXPECTED_PERIOD rounds
  — the alert the policy promises. The period is derived, not vibes:
  window 50 (a HARD driver cap — r3 shipped 51 names and got exactly
  50 rows back), and since r13 additions are throttled so the whole
  oldest evidence class fits each window (~4-13 new/changed rows,
  ~44 re-confirmation slots); 425 standing rows / 44 ~ 10.

Usage:  python tools/evidence_age.py [--round N]
        exit code 1 if any row exceeds the period (CI-able); the
        pytest wrapper (tests/test_driver_contract.py) asserts the
        CURRENT priority window covers the oldest class instead, so a
        driver outage cannot fail the suite retroactively.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
EXPECTED_PERIOD = 10  # rounds between re-confirmations at current sizes


def latest_green_rounds() -> tuple[dict[str, int], int]:
    """-> ({query_name: newest all-green round}, newest round seen)."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            ok = bool(res.get("rows_match")) and bool(res.get("schema_match"))
            if "hash_match" in res and res["hash_match"] is not None:
                ok = ok and bool(res["hash_match"])
            if ok and res.get("err") in (None, ""):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest


def plan_window(head: list[str], cap: int = 50) -> tuple[list[str], list[str]]:
    """Compose the next round's PRIORITY window per the rotation policy
    (BASELINE.md "Evidence-age policy"): the caller-supplied head (this
    round's changed-code rows + additions, i.e. everything the
    mechanical rules force into the window) goes first, then no-evidence
    rows not already in the head, then the oldest evidence classes fill
    lexicographically up to the hard 50-row driver cap (r3: position 51
    was silently dropped). Returns (window, named_overflow) — the
    overflow MUST be named verbatim in the registry's next-round head
    comment, never silently deferred.

    Usage: python tools/evidence_age.py --plan changed1,new2,...
    """
    from http_datafusion_spark.plans.registry import all_queries

    names = list(all_queries())
    latest, _ = latest_green_rounds()
    window = [n for n in head if n in names]
    unknown = sorted(set(head) - set(names))
    if unknown:
        raise SystemExit(f"--plan names not in the registry: {unknown}")
    for n in sorted(n for n in names if n not in latest):
        if n not in window:
            window.append(n)  # no-evidence rows are mandatory occupants
    if len(window) > cap:
        raise SystemExit(
            f"head + no-evidence rows already exceed the {cap}-row cap "
            f"({len(window)}) — throttle additions"
        )
    by_round: dict[int, list[str]] = {}
    for n, r in latest.items():
        if n in names:
            by_round.setdefault(r, []).append(n)
    overflow: list[str] = []
    for rnd in sorted(by_round):
        for n in sorted(by_round[rnd]):
            if n in window:
                continue
            if len(window) < cap:
                window.append(n)
            elif rnd == min(by_round):
                overflow.append(n)  # oldest-class rows that missed the cap
    return window, overflow


def main() -> int:
    from http_datafusion_spark.plans.registry import PRIORITY, all_queries

    if len(sys.argv) > 1 and sys.argv[1] == "--plan":
        head = [
            n.strip()
            for n in (sys.argv[2] if len(sys.argv) > 2 else "").split(",")
            if n.strip()
        ]
        window, overflow = plan_window(head)
        print("PRIORITY window plan (paste-ready, 50 rows):")
        for n in window:
            print(f'    "{n}",')
        if overflow:
            print(f"# NAMED OVERFLOW for the round after ({len(overflow)}):")
            for n in overflow:
                print(f"#   {n}")
        return 0

    names = list(all_queries())
    latest, newest = latest_green_rounds()

    hist: dict[int, int] = {}
    never: list[str] = []
    for n in names:
        if n in latest:
            hist[latest[n]] = hist.get(latest[n], 0) + 1
        else:
            never.append(n)

    print(f"registry rows: {len(names)}; newest driver round: r{newest}")
    print("evidence-age histogram (latest all-green round -> rows):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")
    if never:
        print(f"rows with NO driver evidence ({len(never)}): {sorted(never)}")

    overdue = sorted(
        n for n in names if n in latest and newest - latest[n] > EXPECTED_PERIOD
    )
    if overdue:
        print(
            f"OVERDUE (> {EXPECTED_PERIOD} rounds since last green): {overdue}"
        )
    # The actionable check: the oldest evidence class (and every
    # no-evidence row) must be covered by the CURRENT priority window
    # or explicitly deferred in the registry's named next-round head.
    window = set(PRIORITY)
    uncovered_never = [n for n in never if n not in window]
    if uncovered_never:
        print(f"no-evidence rows NOT in the current window: {uncovered_never}")
    return 1 if overdue or uncovered_never else 0


if __name__ == "__main__":
    sys.exit(main())
