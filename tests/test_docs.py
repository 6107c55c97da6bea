"""Doc/evidence freeze rules — the registry and its evidence documents
may not drift apart.

Two consecutive rounds ended with an operator appended to the registry
in the final snapshot commit, AFTER the docs froze and the last
full-suite run (r8: vocab_chao1_unseen, locally green but undocumented;
r9: stream_watermark_late_drop, RED). The r9 verdict's task 3 mandates
a structural stop: every registered query must appear, by name, in
COVERAGE.md — so a snapshot-time append without its evidence row fails
the suite itself.
"""

from __future__ import annotations

import os
import re

from http_datafusion_spark.plans.registry import PRIORITY, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as fh:
        return fh.read()


def test_every_registry_query_has_a_coverage_row():
    """FREEZE RULE: no registry append without a COVERAGE.md mention.

    The check is a word-boundary name match anywhere in the document —
    COVERAGE.md lists queries inline in prose and tables, not one
    format — which is exactly the invariant the r8/r9 stragglers
    violated (their names appeared nowhere)."""
    cov = _read("COVERAGE.md")
    missing = [
        name
        for name in sorted(all_queries())
        if not re.search(rf"\b{re.escape(name)}\b", cov)
    ]
    assert not missing, (
        f"{len(missing)} registry queries have no COVERAGE.md row "
        f"(freeze rule: document BEFORE the snapshot commit): {missing}"
    )


def test_coverage_headline_count_matches_registry():
    """The headline '**N registry queries' claim must equal the actual
    registry size — COVERAGE.md:3 drifted off by one in both r8 and r9."""
    cov = _read("COVERAGE.md")
    m = re.search(r"\*\*(\d+) registry queries", cov)
    assert m, "COVERAGE.md headline count not found"
    assert int(m.group(1)) == len(all_queries()), (
        f"COVERAGE.md claims {m.group(1)} queries; registry holds "
        f"{len(all_queries())} — update the headline with the append"
    )


def test_priority_window_names_resolve():
    """Every PRIORITY entry must be a registered query (a typo here
    silently shrinks the driver window)."""
    qs = all_queries()
    unknown = [p for p in PRIORITY if p not in qs]
    assert not unknown, f"PRIORITY names not in registry: {unknown}"
