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
