"""Bucketed range (interval) join — the third member of the
time-join family SURVEY §2.3 marks out-of-scope for DataFusion 43
(as-of: operators/asof.py; range frames: plans/windows.py).

Problem: join points ``p`` to intervals ``[start, end)`` sharing a
key. The naive plan is a non-equi theta join — Spark falls back to
BroadcastNestedLoopJoin, O(N·M) at scale. The scale-safe form
bucketizes the time axis: an interval registers in every bucket it
overlaps, a point in exactly one, and the join becomes an EQUI-join on
(key, bucket) followed by the exact range filter. Shuffle cost is
O(N + M·avg_span/bucket) and Catalyst plans a hash join.

Demo: each 'click' event joined to the 10-minute attribution window
opened by the same user's preceding 'purchase' events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

WINDOW_SEC = 600  # attribution window length
BUCKET_SEC = 600  # bucket width ~ interval length => each interval hits <= 2 buckets


def bucketed_range_join(
    points: DataFrame,  # (key, t, ...point cols)
    intervals: DataFrame,  # (key, start, end, ...interval cols)
    bucket_sec: int = BUCKET_SEC,
) -> DataFrame:
    """Equi-join points into [start, end) intervals via time bucketing."""
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / bucket_sec).cast("bigint"),
                F.floor((F.col("end") - 1) / bucket_sec).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn("_b", F.floor(F.col("t") / bucket_sec).cast("bigint"))
    return (
        pt.join(iv, on=["key", "_b"])
        .filter((F.col("t") >= F.col("start")) & (F.col("t") < F.col("end")))
        .drop("_b")
    )


@query(
    "range_join_attribution",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id AS key, event_id AS purchase_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS start,
             CAST(floor(epoch(ts)) AS BIGINT) + {WINDOW_SEC} AS "end"
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id AS key, event_id AS click_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           round(sum(value), 4)     AS attributed_value
    FROM clicks JOIN purchases USING (key)
    WHERE t >= start AND t < "end"
    GROUP BY purchase_id
    """,
    doc=f"range/interval join: clicks into {WINDOW_SEC // 60}-min purchase attribution windows, bucketed equi-join impl (beyond-reference operator)",
    tags=("range", "join", "events"),
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    es = F.unix_timestamp("ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("purchase_id"),
        es.alias("start"),
        (es + WINDOW_SEC).alias("end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("click_id"),
        es.alias("t"),
        "value",
    )
    joined = bucketed_range_join(clicks, purchases)
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 4).alias("attributed_value"),
    )


# ----------------------------------------------- grid-blocked spatial join

GEO_SPAN = 1_000_000  # integer coordinate domain [0, SPAN)
GEO_CELL = 50_000  # grid cell edge
GEO_R2 = 40_000**2  # neighbor radius^2 (< cell edge, so 3x3 cells suffice)
_GEO_N_CUST = 400  # derived point set size: custkey % N


def _geo_points_sql() -> str:
    from http_datafusion_spark.functions.hashing import md5_int_sql

    hx = md5_int_sql("concat('gx|', CAST(id AS VARCHAR))")
    hy = md5_int_sql("concat('gy|', CAST(id AS VARCHAR))")
    return f"""
      SELECT id, {hx} % {GEO_SPAN} AS x, {hy} % {GEO_SPAN} AS y
      FROM (SELECT DISTINCT c_custkey % {_GEO_N_CUST} AS id FROM customer)
    """


@query(
    "geo_grid_join",
    oracle=f"""
    WITH pts AS ({_geo_points_sql()}),
    cells AS (
      SELECT id, x, y,
             CAST(floor(x / {GEO_CELL}) AS BIGINT) AS cx,
             CAST(floor(y / {GEO_CELL}) AS BIGINT) AS cy
      FROM pts
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM cells a JOIN cells b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {GEO_R2}
    )
    SELECT id_a, id_b, CAST(d2 AS BIGINT) AS dist2
    FROM pairs
    """,
    doc="grid-blocked spatial neighbor join — the geospatial sibling of LSH "
    "banding: points (md5-derived integer coordinates, so distance math is "
    "EXACT integer arithmetic with no trig/float boundary ties) are assigned "
    "to grid cells sized >= the search radius, candidate pairs come from a "
    "3x3 neighbor-cell equi-join (each point replicates to at most 9 cell "
    "probes; here expressed as a +-1 range condition on the cell ids), and "
    "the exact distance verifies only candidates — candidates are O(sum "
    "cell^2), never all-pairs O(N^2). This is the geohash/S2 blocking shape "
    "every spatial join at 100 TB uses; skewed cells (cities) fall out of "
    "AQE skew splitting exactly like hot LSH bands "
    "(SURVEY §2.3 non-equi family extension / spatial)",
    tags=("join",),
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from http_datafusion_spark.functions.hashing import md5_int
    from http_datafusion_spark.plans.tables import load_tables

    c = load_tables(spark, sf_dir, "customer")["customer"]
    ids = c.select((F.col("c_custkey") % _GEO_N_CUST).alias("id")).distinct()
    pts = ids.select(
        "id",
        (md5_int(F.concat(F.lit("gx|"), F.col("id").cast("string"))) % GEO_SPAN).alias("x"),
        (md5_int(F.concat(F.lit("gy|"), F.col("id").cast("string"))) % GEO_SPAN).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / GEO_CELL).cast("bigint").alias("cx"),
        F.floor(F.col("y") / GEO_CELL).cast("bigint").alias("cy"),
    )
    # explicit 9-cell replication of the probe side -> pure EQUI-join on
    # the cell key (shuffle-partitionable; the BETWEEN form would plan a
    # range join). Each left point emits 9 (cell, point) probes.
    probe = cells.select(
        "id", "x", "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("jcx"), (F.col("cy") + dy).alias("jcy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select("id", "x", "y", "c.jcx", "c.jcy")
    a, b = probe.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.jcx") == F.col("b.cx"))
            & (F.col("a.jcy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            d2.cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= GEO_R2)
    )
