"""Cross-check our hand-rolled ANN paths against Spark MLlib's
BucketedRandomProjectionLSH — the built-in alternative a Spark user
would reach for. Establishes (a) the MLlib API works on the same
embeddings table, (b) our exact brute-force top-k is a superset of
what LSH recalls at these settings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_datafusion_spark.plans.tables import load_tables


def test_brp_lsh_neighbors_agree_with_bruteforce(spark, sf_dir):
    try:
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector
    except ImportError:
        pytest.skip("pyspark.ml not available")

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vecs = e.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=6, seed=42
    )
    model = lsh.fit(vecs)
    query = vecs.filter(F.col("vec_id") == 0).first().features
    k = 5
    approx = {r.vec_id for r in model.approxNearestNeighbors(vecs, query, k + 1).collect()}
    approx.discard(0)

    # exact L2 top-k via a JVM fold (same metric BRP-LSH approximates)
    emb = F.col("embedding").cast("array<double>")
    qrow = e.filter(F.col("vec_id") == 0).select(emb.alias("qv"))
    d2 = F.aggregate(
        F.zip_with(emb, F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = [
        r.vec_id
        for r in e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(2 * k)
        .collect()
    ]
    # LSH is approximate: require meaningful overlap with the exact
    # 2k-neighborhood, not equality.
    assert len(approx & set(exact)) >= k // 2
