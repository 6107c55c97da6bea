"""Connected-components clustering of near-duplicate pairs — the step
between pair detection (dedup.py) and group-level dedup policy
(keep best-of-cluster rather than greedy pair pruning).

Spark side: iterative min-label propagation — each round every node
takes the min label among itself and its neighbors, until a fixpoint.
This is the hash-join formulation of large-scale connected components
(GraphFrames-style): each iteration is one join + one aggregate, and
the iteration count is the graph diameter (near-dup clusters are tiny,
so 2-4 rounds). Checkpoint-free because lineage stays shallow per
round (each round starts from a materialized local result).

Oracle: transitive closure via a recursive CTE, min over the closure —
trivially correct, only viable because the candidate graph is small;
the point of the Spark formulation is that it is NOT bounded by
closure size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.operators.dedup import _minhash_pairs_sql, dedup_minhash_pairs
from http_datafusion_spark.plans.registry import query


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (node, component) where component = min node id reachable.
    """
    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").union(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    ).distinct()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
        )
        # Fixpoint check on a materialized snapshot (keeps lineage flat).
        new_rows = new_labels.collect()
        changed = {r.node: r.label for r in new_rows} != {r.node: r.label for r in labels.collect()}
        labels = labels.sparkSession.createDataFrame(new_rows, schema=labels.schema)
        if not changed:
            break
    return labels.select("node", F.col("label").alias("component"))


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
    doc="connected-components clustering of MinHash near-dup pairs: iterative label propagation vs recursive-CTE oracle (north-star dedup)",
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
