"""As-of (point-in-time) join — an operator the reference's engine
lacks entirely (SURVEY §2.3: DataFusion 43 has no ASOF JOIN) and Spark
has no native form of either.

Implemented with the union-merge trick rather than a pairwise
range-join: both sides are unioned with a side marker, sorted within
each key partition by (time, side), and the right-side payload is
carried forward with ``last(..., ignorenulls=True)`` over a running
window. One shuffle on the join key, no row-pair explosion — at 100 TB
this is the difference between O(N log N) and the O(N·M) blowup of a
naive ``t_left >= t_right`` theta join.

Demo query: each event joined to the most recent order (by order date)
of its mapped customer. Ties on order time break by max orderkey —
fully deterministic and mirrored in the oracle's QUALIFY form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_time <= left_time`` sharing the key ``on``.

    Left columns are preserved; payload columns arrive as
    ``asof_<name>`` (null when no right row precedes the left time).
    """
    # ALL payload columns travel in ONE struct carried by a single
    # last(ignorenulls=True): per-column carries would mix values from
    # different right rows whenever a payload field is NULL in one right
    # row but not another (latest orderkey paired with an older price).
    rdt = dict(right.dtypes)
    payload_t = "struct<" + ",".join(f"asof_{c}:{rdt[c]}" for c in payload_cols) + ">"
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("_tie"),
        F.lit(None).cast(payload_t).alias("_payload"),
        F.struct(*left.columns).alias("_row"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(payload_cols[0]).cast("bigint").alias("_tie"),
        F.struct(*[F.col(c).alias(f"asof_{c}") for c in payload_cols]).alias("_payload"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_row"),
    )
    # Right rows sort before left rows at equal time (<= semantics); ties
    # among right rows resolve to the greatest _tie (payload key).
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_side", F.col("_tie").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt).select(
        "_side",
        "_row",
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return carried.filter(F.col("_side") == 1).select("_row.*", "_payload.*")


@query(
    "asof_join_latest_order",
    oracle="""
    WITH mx AS (SELECT max(c_custkey) AS m FROM customer),
    ev AS (
      SELECT event_id, user_id % m + 1 AS custkey, CAST(floor(epoch(ts)) AS BIGINT) AS t_sec
      FROM events, mx
    )
    SELECT event_id, custkey,
           o_orderkey AS asof_orderkey,
           round(o_totalprice, 2) AS asof_price
    FROM ev
    LEFT JOIN orders ON o_custkey = custkey AND CAST(floor(epoch(o_orderdate)) AS BIGINT) <= t_sec
    QUALIFY row_number() OVER (
      PARTITION BY event_id
      ORDER BY floor(epoch(o_orderdate)) DESC NULLS LAST, o_orderkey DESC NULLS LAST
    ) = 1
    """,
    doc="as-of join: each event -> latest preceding order of its customer, union-merge implementation (beyond-reference operator)",
    tags=("asof", "join", "bench"),
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "events", "orders", "customer")
    max_ck = t["customer"].agg(F.max("c_custkey").alias("m"))
    ev = (
        t["events"]
        .crossJoin(F.broadcast(max_ck))
        .select(
            "event_id",
            (F.col("user_id") % F.col("m") + 1).alias("custkey"),
            F.unix_timestamp("ts").alias("t_sec"),
        )
    )
    orders = t["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.unix_timestamp("o_orderdate").alias("o_sec"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_price"),
    )
    joined = asof_join(
        ev, orders, on="custkey", left_time="t_sec", right_time="o_sec",
        payload_cols=["o_orderkey", "o_price"],
    )
    return joined.select(
        "event_id",
        "custkey",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_price").alias("asof_price"),
    )
