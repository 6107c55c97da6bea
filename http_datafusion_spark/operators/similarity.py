"""Similarity search over the ``embeddings`` table — north-star
extension (ANN over an ``array<float>`` column).

Two tiers:

- ``sim_bruteforce_topk`` — exact cosine top-k. The dot product is a
  JVM-side higher-order expression (``zip_with`` + ``aggregate``), so
  the scan is embarrassingly parallel and the top-k is Catalyst's
  TakeOrderedAndProject (per-partition heaps, no global sort).
- ``sim_ivf_topk`` — IVF-style bucketed search: vectors are assigned
  to their nearest of K fixed centroids at "index build" time; a query
  probes only the nprobe nearest buckets. At 100 TB this is the path:
  the bucket assignment is one narrow column, bucket pruning is a
  partition filter, and only ~nprobe/K of the data is scanned. Both
  tiers are deterministic and oracle-checked; tests verify IVF recall
  against brute force.

Centroids are taken from fixed vec_ids (deterministic, no RNG) —
standing in for a k-means fit, which would be an offline job at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

QUERY_VEC_ID = 0  # the "query" is the embedding of vec_id 0
N_CENTROIDS = 8
CENTROID_VEC_IDS = tuple(range(1, N_CENTROIDS + 1))
N_PROBE = 2
TOP_K = 10

_DOT_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    emb = F.col("embedding").cast("array<double>")
    return e.select("vec_id", "label", emb.alias("emb"), _norm(emb).alias("nrm"))


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings
    ), q AS (
      SELECT embedding AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           round({_DOT_SQL.format(a='embedding', b='qv')} / (nrm * qn), 6) AS cosine
    FROM e, q
    WHERE vec_id <> {QUERY_VEC_ID}
    ORDER BY {_DOT_SQL.format(a='embedding', b='qv')} / (nrm * qn) DESC, vec_id
    LIMIT {TOP_K}
    """,
    doc="exact cosine top-k (brute force baseline; TakeOrderedAndProject, no global sort) (north-star similarity)",
    tags=("similarity", "bench"),
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    qrow = base.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _dot(F.col("emb"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    return (
        base.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qrow))
        .withColumn("cosine_raw", cos)
        .orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.col("label").cast("bigint").alias("label"), F.round("cosine_raw", 6).alias("cosine"))
    )


def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2).

    One broadcast of K centroids + a narrow shuffle-free projection:
    at scale this column becomes the table's partition key.
    """
    base = _base(spark, sf_dir)
    cents = (
        base.filter(F.col("vec_id").isin(*CENTROID_VEC_IDS))
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cv"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("emb"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = F.row_number().over(W.partitionBy("vec_id").orderBy(F.col("dist2"), F.col("cid")))
    return (
        base.crossJoin(F.broadcast(cents))
        .withColumn("dist2", d2)
        .withColumn("rn", w)
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "emb", "nrm", F.col("cid").alias("bucket"))
    )


_IVF_ASSIGN_SQL = f"""
    e AS (
      SELECT vec_id, label, embedding,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings
    ), cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id IN {CENTROID_VEC_IDS}
    ), assigned AS (
      SELECT vec_id, label, embedding, nrm, cid AS bucket
      FROM (
        SELECT e.vec_id, e.label, e.embedding, e.nrm, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                             * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), c.cid
               ) AS rn
        FROM e CROSS JOIN cents c
      ) WHERE rn = 1
    )
"""


@query(
    "sim_label_centroids",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c_dim1,
           round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c_dim2,
           round(avg(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="per-label centroid components + mean norm (vector aggregation shape for k-means-style refits) (north-star similarity)",
    tags=("similarity",),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    emb = F.col("embedding").cast("array<double>")
    return (
        e.select("label", emb.alias("emb"), _norm(emb).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.element_at("emb", 1)), 6).alias("c_dim1"),
            F.round(F.avg(F.element_at("emb", 2)), 6).alias("c_dim2"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )


@query(
    "sim_ivf_buckets",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL}
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels
    FROM assigned
    GROUP BY bucket
    """,
    doc="IVF index build: nearest-centroid bucket assignment + bucket profile (north-star similarity scale path)",
    tags=("similarity",),
)
def sim_ivf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_assignments(spark, sf_dir).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL},
    q AS (
      SELECT embedding AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID}
    ), probe AS (
      SELECT cid
      FROM cents, q
      ORDER BY list_sum(list_transform(range(1, len(cv) + 1),
               i -> (CAST(cv[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE))
                  * (CAST(cv[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE)))), cid
      LIMIT {N_PROBE}
    )
    SELECT a.vec_id, CAST(a.label AS BIGINT) AS label,
           round({_DOT_SQL.format(a='a.embedding', b='qv')} / (a.nrm * qn), 6) AS cosine
    FROM assigned a, q
    WHERE a.bucket IN (SELECT cid FROM probe) AND a.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_DOT_SQL.format(a='a.embedding', b='qv')} / (a.nrm * qn) DESC, a.vec_id
    LIMIT {TOP_K}
    """,
    doc=f"IVF-bucketed ANN top-k: probe {N_PROBE}/{N_CENTROIDS} buckets only (north-star similarity scale path)",
    tags=("similarity", "bench"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = ivf_assignments(spark, sf_dir)
    base = _base(spark, sf_dir)
    qrow = base.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qv"), F.col("nrm").alias("qn")
    )
    cents = base.filter(F.col("vec_id").isin(*CENTROID_VEC_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cv")
    )
    qd2 = F.aggregate(
        F.zip_with(F.col("cv"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe = (
        cents.crossJoin(F.broadcast(qrow))
        .withColumn("qd2", qd2)
        .orderBy("qd2", "cid")
        .limit(N_PROBE)
        .select("cid")
    )
    cos = _dot(F.col("emb"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    return (
        assigned.join(F.broadcast(probe), assigned.bucket == F.col("cid"), "left_semi")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qrow))
        .withColumn("cosine_raw", cos)
        .orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.col("label").cast("bigint").alias("label"), F.round("cosine_raw", 6).alias("cosine"))
    )
