"""Deeper TPC-H-shaped coverage — optimizer-stressing query shapes the
simple corpus doesn't hit: correlated aggregate subqueries against
derived tables (Q2), conditional bucket aggregation (Q12), ratio
metrics (Q14), group-HAVING subquery feeding a join (Q18), and wide
disjunctive predicates (Q19). All decorrelation/rewrite work is
Catalyst's (SURVEY §4.2) — these queries prove it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.functions.fixedpoint import dsum, money_x_rate6, two_level_agg, unscale
from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS supply_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT pk, sk, supply_cost
    FROM ps
    WHERE supply_cost = (SELECT min(p2.supply_cost) FROM ps p2 WHERE p2.pk = ps.pk)
      AND pk % 10 = 0
    """,
    doc="TPC-H Q2 shape: correlated min-aggregate subquery over a derived part-supplier table (SURVEY §4.2 decorrelation)",
    tags=("subquery", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "lineitem")
    # Exact decimal supply cost => the equality against min() compares
    # identical doubles on both engines (no float-drift ambiguity).
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS supply_cost
          FROM lineitem GROUP BY 1, 2
        )
        SELECT pk, sk, supply_cost
        FROM ps
        WHERE supply_cost = (SELECT min(p2.supply_cost) FROM ps p2 WHERE p2.pk = ps.pk)
          AND pk % 10 = 0
        """
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: priority-bucket conditional counts over a join (SURVEY §2.4)",
    tags=("join", "agg"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             4) AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-09-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue ratio (conditional decimal sums, deterministic quotient) (SURVEY §2.4/2.8)",
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev6 = money_x_rate6("l_extendedprice", "l_discount")
    promo6 = F.when(F.col("p_type").like("PROMO%"), rev6).otherwise(F.lit(0).cast("bigint"))
    joined = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-09-01 00:00:00").cast("timestamp"))
        )
    )
    return two_level_agg(
        joined,
        [],
        partial={"p6": F.sum(promo6), "r6": F.sum(rev6), "__n": F.count(F.lit(1))},
        final={
            "promo_revenue_pct": F.round(
                F.lit(100.0) * unscale(dsum("p6")).cast("double") / unscale(dsum("r6")).cast("double"),
                4,
            ),
            "n_items": F.coalesce(F.sum("__n"), F.lit(0).cast("bigint")),
        },
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           round(qty, 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big ON big.l_orderkey = o_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate subquery joined back to orders/customers (SURVEY §2.3/2.4/2.6)",
    tags=("join", "agg", "topk"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: wide disjunctive multi-column predicate over a join (SURVEY §2.2 predicate row)",
    tags=("join", "filter"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    joined = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey")).filter(clause)
    return two_level_agg(
        joined,
        [],
        partial={
            "r6": F.sum(money_x_rate6("l_extendedprice", "l_discount")),
            "__n": F.count(F.lit(1)),
        },
        final={
            "revenue": unscale(dsum("r6"), round_to=2).cast("double"),
            "n_items": F.coalesce(F.sum("__n"), F.lit(0).cast("bigint")),
        },
    )


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated on the fact table -> left-semi join + agg (SURVEY §2.3/§4.2)",
    tags=("subquery", "join", "tpch"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: outer join with join-condition filter, double aggregation (customer order-count histogram) (SURVEY §2.3/2.4)",
    tags=("join", "agg", "tpch"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") != "F"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated scalar AVG subquery against the fact table, decorrelated to an aggregate join (SURVEY §4.2)",
    tags=("subquery", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    HAVING count(*) > 2
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS on the same fact table (semi AND anti join against correlated subsets) (SURVEY §2.3/§4.2)",
    tags=("subquery", "join", "tpch"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
        GROUP BY s_name
        HAVING count(*) > 2
        """
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join + agg (SURVEY §2.3/§4.2)",
    tags=("subquery", "join", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        WITH avg_bal AS (
          SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY c_mktsegment
        """
    )
