"""Connected-components clustering of near-duplicate pairs — the step
between pair detection (dedup.py) and group-level dedup policy
(keep best-of-cluster rather than greedy pair pruning).

Spark side: alternating **large-star / small-star contraction**
(Kiveris et al., "Connected Components in MapReduce and Beyond"):
each round is two join+aggregate passes that re-point edges at the
minimum node seen so far, converging in O(log^2 n) rounds regardless
of component diameter — unlike plain label propagation, whose round
count is the graph diameter. Everything stays distributed:

- the fixpoint check is a 1-row aggregate digest (count + hash-sum)
  of the edge set — never a collect() of node labels, so driver
  memory is O(1) in graph size;
- ``localCheckpoint(eager=True)`` after each round cuts lineage so
  plan depth stays flat across iterations.

Oracle: transitive closure via a recursive CTE, min over the closure —
trivially correct, only viable because the candidate graph is small;
the point of the Spark formulation is that it is NOT bounded by
closure size.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.operators.dedup import _minhash_pairs_sql, dedup_minhash_pairs
from http_datafusion_spark.plans.registry import query

log = logging.getLogger(__name__)


def _digest(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive fingerprint of an edge set: (count, hash-sum).

    One distributed aggregate, one driver row — this is the ONLY thing
    the driver ever materializes, so the fixpoint check costs O(1)
    driver memory at any graph size.
    """
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-insensitive and overflow-free (ANSI mode rejects
        # a bigint hash *sum* on large edge sets).
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u}). Emitted as (neighbor, min)."""
    adj = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = adj.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        adj.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small, then connect every small-side
    neighbor (and u itself) to the minimum neighbor."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relinked = oriented.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_link = mins.select("u", F.col("m").alias("v"))
    return relinked.union(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """Large-star/small-star contraction over an undirected edge list.

    Returns (node, component) where component = min node id reachable.
    Raises RuntimeError if ``max_iter`` rounds pass without convergence
    (each round shrinks the star forest; O(log^2 n) rounds suffice, so
    exhaustion means something is genuinely wrong — never return
    silently-unconverged labels).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _digest(e)
    for it in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _digest(e)
        if cur == prev:
            log.debug("connected_components converged after %d rounds", it + 1)
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds"
        )
    # At the fixpoint every edge points a node at its component min; the
    # min itself (and any isolated node) self-labels via the anti-join.
    labeled = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = nodes.join(labeled, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return labeled.union(centers)


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
      SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT CAST(component AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT)  AS cluster_size
    FROM comp
    GROUP BY component
    """,
    doc="connected-components clustering of MinHash near-dup pairs: large-star/small-star contraction vs recursive-CTE oracle (north-star dedup)",
    tags=("dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.countDistinct("node").alias("cluster_size")
    )
