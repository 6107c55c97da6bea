"""Window-function corpus — SURVEY.md §2.5.

Ranking, offset (lag/lead/nth), and aggregates-over-windows with
explicit ROWS/RANGE frames. Determinism rules:

- ``row_number``/``ntile`` are only deterministic over a total order,
  so their ORDER BY always ends with a unique key;
- ``rank``/``dense_rank``/``percent_rank``/``cume_dist`` are
  value-determined, so they may order by non-unique keys (that is
  what makes them interesting) — results are stable either way.

Scale note: every window here partitions by a key (one shuffle on the
partition key, then sorted within partitions) — no global
un-partitioned window, which would single-task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


@query(
    "q_window_ranking",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           CAST(row_number()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
           CAST(rank()         OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT)              AS rnk,
           CAST(dense_rank()   OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT)              AS drnk,
           round(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment), 6)                    AS prnk,
           round(cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment), 6)                    AS cdist,
           CAST(ntile(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer
    """,
    doc="row_number/rank/dense_rank/percent_rank/cume_dist/ntile (SURVEY §2.5)",
    tags=("window",),
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    w_uniq = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_seg = W.partitionBy("c_nationkey").orderBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_uniq).cast("bigint").alias("rn"),
        F.rank().over(w_seg).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_seg).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w_seg), 6).alias("prnk"),
        F.round(F.cume_dist().over(w_seg), 6).alias("cdist"),
        F.ntile(4).over(w_uniq).cast("bigint").alias("quartile"),
    )


@query(
    "q_window_offsets",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           round(lag(o_totalprice)     OVER w, 2)                    AS prev_price,
           round(lead(o_totalprice)    OVER w, 2)                    AS next_price,
           round(lag(o_totalprice, 2, -1.0) OVER w, 2)               AS prev2_price,
           round(first_value(o_totalprice) OVER w, 2)                AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
           round(nth_value(o_totalprice, 2)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead (w/ offset+default), first/last/nth_value with frames (SURVEY §2.5)",
    tags=("window",),
)
def q_window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.lag("o_totalprice", 2, -1.0).over(w), 2).alias("prev2_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias("second_price"),
    )


@query(
    "q_window_running",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)    AS moving_avg_price,
           CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT)                           AS n_lines,
           round(max(l_discount) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS max_disc_from_here
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    doc="aggregates over ROWS frames: running sum, moving avg, whole-partition count, forward max (SURVEY §2.5)",
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias("running_qty"),
            F.round(F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg_price"),
            F.count(F.lit(1)).over(W.partitionBy("l_orderkey")).alias("n_lines"),
            F.round(F.max("l_discount").over(w.rowsBetween(0, W.unboundedFollowing)), 2).alias("max_disc_from_here"),
        )
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey,
           epoch_sec,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch_sec
                                         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
      FROM orders
    )
    """,
    doc="RANGE frame over numeric time (30-day trailing spend per customer) (SURVEY §2.5)",
    tags=("window",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )
    w = W.partitionBy("o_custkey").orderBy("epoch_sec").rangeBetween(-2592000, 0)
    return base.select(
        "o_orderkey",
        "epoch_sec",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    """,
    doc="top-k per group via ranked window + filter (SURVEY §2.5/2.6 composition)",
    tags=("window", "topk", "bench"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


@query(
    "q_window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           round(lag(maybe_price IGNORE NULLS) OVER w, 2)        AS prev_real_price,
           round(last_value(maybe_price IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS last_real_price,
           round(first_value(maybe_price IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS first_real_price
    FROM (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price
      FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="IGNORE NULLS variants of lag/first/last — the gap-skipping window family (SURVEY §2.5 extension)",
    tags=("window",),
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice"))
    base = o.select("o_orderkey", "o_custkey", "o_orderdate", maybe.alias("maybe_price"))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, 0)
    return base.select(
        "o_orderkey",
        # F.lag has no ignoreNulls parameter; the SQL form does.
        F.round(F.expr("lag(maybe_price, 1) IGNORE NULLS").over(w), 2).alias("prev_real_price"),
        F.round(F.last("maybe_price", ignorenulls=True).over(w_run), 2).alias("last_real_price"),
        F.round(F.first("maybe_price", ignorenulls=True).over(w), 2).alias("first_real_price"),
    )


@query(
    "q_window_clause",
    oracle="""
    SELECT o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(rank() OVER w_val AS BIGINT)        AS price_rank,
           round(sum(o_totalprice) OVER w_run, 2)   AS running_spend,
           CAST(count(*) OVER w_all AS BIGINT)      AS n_orders
    FROM orders
    WHERE o_custkey < 50
    WINDOW w_val AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
           w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING),
           w_all AS (PARTITION BY o_custkey)
    """,
    doc="named WINDOW clause (SQL surface both engines share): three named specs "
    "over one partition key reused by rank / running sum / partition count — all "
    "three share the o_custkey shuffle (SURVEY §2.5)",
    tags=("window",),
)
def q_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(rank() OVER w_val AS BIGINT)        AS price_rank,
               round(sum(o_totalprice) OVER w_run, 2)   AS running_spend,
               CAST(count(*) OVER w_all AS BIGINT)      AS n_orders
        FROM orders
        WHERE o_custkey < 50
        WINDOW w_val AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
               w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING),
               w_all AS (PARTITION BY o_custkey)
        """
    )
