"""Subquery corpus — SURVEY.md §2.3 (semi/anti rows) + §4.2
(decorrelation rewrites).

The reference inherits scalar-subquery and IN/EXISTS decorrelation
from DataFusion's optimizer (SURVEY §4.2); Catalyst performs the same
rewrites (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery).
These are written through ``spark.sql`` because the SQL subquery
surface itself is the operator under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_nationkey
    """,
    doc="uncorrelated scalar subquery in WHERE (SURVEY §4.2 decorrelation)",
    tags=("subquery",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_above_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        GROUP BY c_nationkey
        """
    )


@query(
    "q_correlated_scalar_subquery",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s_acctbal > (
      SELECT avg(c_acctbal) FROM customer c WHERE c.c_nationkey = s.s_nationkey
    )
    """,
    doc="correlated scalar subquery (per-nation average) (SURVEY §4.2)",
    tags=("subquery",),
)
def q_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "supplier", "customer")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        FROM supplier s
        WHERE s_acctbal > (
          SELECT avg(c_acctbal) FROM customer c WHERE c.c_nationkey = s.s_nationkey
        )
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderkey % 7 = 0
    """,
    doc="IN (subquery) -> semi join (SURVEY §2.3 semi row)",
    tags=("subquery",),
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderkey % 7 = 0
        """
    )


@query(
    "q_not_in_subquery",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      AND p_partkey % 5 = 0
    """,
    doc="NOT IN (subquery) -> null-aware anti join (SURVEY §2.3 anti row)",
    tags=("subquery",),
)
def q_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
          AND p_partkey % 5 = 0
        """
    )


@query(
    "q_subquery_in_from",
    oracle="""
    SELECT seg, round(avg(order_total), 2) AS avg_order_total
    FROM (
      SELECT c.c_mktsegment AS seg, o.o_orderkey, sum(o.o_totalprice) AS order_total
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_orderkey
    ) t
    GROUP BY seg
    """,
    doc="derived table (subquery in FROM) with two-level aggregation",
    tags=("subquery",),
)
def q_subquery_in_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT seg, round(avg(order_total), 2) AS avg_order_total
        FROM (
          SELECT c.c_mktsegment AS seg, o.o_orderkey, sum(o.o_totalprice) AS order_total
          FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_mktsegment, o.o_orderkey
        ) t
        GROUP BY seg
        """
    )


@query(
    "q_cte",
    oracle="""
    WITH nation_stats AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust, avg(c_acctbal) AS avg_bal
      FROM customer GROUP BY c_nationkey
    ), rich AS (
      SELECT nk FROM nation_stats WHERE avg_bal > (SELECT avg(avg_bal) FROM nation_stats)
    )
    SELECT n_name, CAST(n_cust AS BIGINT) AS n_cust, round(avg_bal, 4) AS avg_bal
    FROM nation_stats
    JOIN rich USING (nk)
    JOIN nation ON nk = n_nationkey
    """,
    doc="WITH / common table expressions feeding joins (SQL surface via sqlparser, SURVEY §2 layer I)",
    tags=("subquery",),
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        WITH nation_stats AS (
          SELECT c_nationkey AS nk, count(*) AS n_cust, avg(c_acctbal) AS avg_bal
          FROM customer GROUP BY c_nationkey
        ), rich AS (
          SELECT nk FROM nation_stats WHERE avg_bal > (SELECT avg(avg_bal) FROM nation_stats)
        )
        SELECT n_name, CAST(n_cust AS BIGINT) AS n_cust, round(avg_bal, 4) AS avg_bal
        FROM nation_stats
        JOIN rich USING (nk)
        JOIN nation ON nk = n_nationkey
        """
    )
