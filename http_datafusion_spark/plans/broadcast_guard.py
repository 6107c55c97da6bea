"""Structural guard against forced broadcasts of data-growing relations.

The round-6 verdict found eight operators baking ``F.broadcast`` hints
onto relations that GROW with the data (vocabulary/bigram count tables,
per-document set sizes, fact-derived key sets). A baked-in hint is a
plan AQE cannot demote — at 100 TB each such site is an executor/driver
OOM. This module walks a query's ANALYZED logical plan (where
``ResolvedHint (strategy=broadcast)`` still wraps its subtree, before
the optimizer folds hints into Join nodes) and flags every broadcast
subtree that reads a fact-scale table without an intervening bound:

- a zero-grouping-key Aggregate (aggregation to a constant row), or
- a Limit / top-k (output bounded by a literal), or
- a ``spark.range(K)`` over a model/config constant.

Tables treated as fact-scale (row count linear in SF): documents,
lineitem, orders, events, embeddings, part. The dimension convention
(customer/supplier/nation/region as broadcast dims) is deliberately
exempt — it is the standard star-schema trade and AQE still applies to
un-hinted dims.

Used by tests/test_plans.py::test_no_forced_broadcast_of_fact_derived_relations,
which asserts the violation set over the ENTIRE registry stays inside a
documented allowlist (benchmark/eval probe sets that are constants of
the pipeline, not functions of corpus size).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

# Column-name fingerprints identifying the parquet relation. The
# analyzed plan prints only the output columns of a Relation node, so
# the table is recovered from its characteristic first columns.
_FACT_MARKERS: dict[str, str] = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "event_id": "events",
    "p_partkey": "part",
}


def _relation_table(line: str) -> str | None:
    m = re.search(r"Relation \[([^\]]*)\]", line)
    if not m:
        return None
    cols = {c.split("#")[0] for c in m.group(1).split(",")}
    for marker, table in _FACT_MARKERS.items():
        if marker in cols:
            return table
    if "text" in cols and "doc_id" in cols:
        return "documents"
    if ("vec" in cols or "embedding" in cols) and "doc_id" in cols:
        return "embeddings"
    return None  # dimension or non-fact source


def _marker_pos(line: str) -> int | None:
    """Indent position of a tree node ('+- ' / ':- '), None for the root."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else None


_ZERO_KEY_AGG = re.compile(r"\bAggregate \[")
_GROUPED_AGG = re.compile(r"\bAggregate \[[^\[]*\], \[")
_BOUNDED = re.compile(r"\b(GlobalLimit|LocalLimit|Limit)\b|\bRange \(0, \d")


@dataclass
class BroadcastViolation:
    fact_tables: tuple[str, ...]
    subtree_head: str


def broadcast_hint_violations(df: DataFrame) -> list[BroadcastViolation]:
    """All broadcast-hinted subtrees of df's analyzed plan that scan a
    fact-scale table with no bounding Aggregate/Limit in the subtree."""
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()
    out: list[BroadcastViolation] = []
    for i, line in enumerate(lines):
        if "ResolvedHint (strategy=broadcast" not in line:
            continue
        pos = _marker_pos(line)
        subtree: list[str] = []
        for nxt in lines[i + 1 :]:
            npos = _marker_pos(nxt)
            if pos is not None and (npos is None or npos <= pos):
                break
            subtree.append(nxt)
        facts = tuple(
            sorted({t for ln in subtree if (t := _relation_table(ln)) is not None})
        )
        if not facts:
            continue
        bounded = any(
            _BOUNDED.search(ln)
            or (_ZERO_KEY_AGG.search(ln) and not _GROUPED_AGG.search(ln))
            for ln in subtree
        )
        if not bounded:
            head = subtree[0].strip() if subtree else ""
            out.append(BroadcastViolation(fact_tables=facts, subtree_head=head))
    return out
