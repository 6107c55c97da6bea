"""Relational operator corpus — SURVEY.md §2.2-2.7.

Covers the DataFusion-inherited surface the reference exposes through
arbitrary ``sql:`` strings (reference src/main.rs:43): projections,
filters, joins of every type, aggregation, grouping sets, windows,
sorts, top-k, set ops, subqueries. Spark side is written with the
DataFrame API where idiomatic (Catalyst produces the same plan as
SQL) and with ``spark.sql`` where the SQL surface itself is the
operator under test (subqueries, grouping sets).

Scale notes (100 TB design):
- dimension tables (region/nation/supplier) are broadcast — no
  shuffle for the fact side of those joins;
- aggregations are expressed declaratively so Catalyst plans
  partial (map-side) + final aggregation — no driver collection;
- top-k = orderBy + limit which Catalyst fuses into
  TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_datafusion_spark.functions.fixedpoint import (
    charge6,
    dsum,
    int6,
    money_x_rate6,
    mul_fixed6,
    two_level_agg,
    unscale,
)
from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

# ---------------------------------------------------------------------------
# Aggregation over a filtered scan (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)      AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)      AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="group-by aggregate w/ filter pushdown (SURVEY §2.4; TPC-H Q1)",
    tags=("agg", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # Price-product sums need ORDER-INDEPENDENT exactness (float
    # partial-agg order differences between engines flip round-half
    # boundaries — observed on q7). The fixed-point two-level pattern
    # (functions/fixedpoint.py) delivers the same exact rational as a
    # decimal(18,6) sum at ~3x the throughput: pure-int64 partials in
    # whole-stage codegen, decimal merge over #groups x #partitions.
    cnt = F.col("__n")
    return two_level_agg(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        partial={
            "q": F.sum("l_quantity"),
            "bp": F.sum("l_extendedprice"),
            "dp6": F.sum(money_x_rate6("l_extendedprice", "l_discount")),
            "ch6": F.sum(charge6("l_extendedprice", "l_discount", "l_tax")),
            "q6": F.sum(int6("l_quantity")),
            "ep6": F.sum(int6("l_extendedprice")),
            "d6": F.sum(int6("l_discount")),
            "__n": F.count(F.lit(1)),
        },
        final={
            "sum_qty": F.round(F.sum("q"), 2),
            "sum_base_price": F.round(F.sum("bp"), 2),
            "sum_disc_price": unscale(dsum("dp6"), round_to=2).cast("double"),
            "sum_charge": unscale(dsum("ch6"), round_to=2).cast("double"),
            "avg_qty": F.round(unscale(dsum("q6")).cast("double") / F.sum(cnt), 4),
            "avg_price": F.round(unscale(dsum("ep6")).cast("double") / F.sum(cnt), 4),
            "avg_disc": F.round(unscale(dsum("d6")).cast("double") / F.sum(cnt), 6),
            "count_order": F.sum(cnt),
        },
    )


@query(
    "q6_revenue_delta",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="scalar aggregate, conjunctive predicates incl. BETWEEN (SURVEY §2.2/2.4; TPC-H Q6)",
    tags=("agg", "filter", "bench"),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return two_level_agg(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ),
        [],
        partial={
            "r6": F.sum(mul_fixed6("l_extendedprice", "l_discount")),
            "__n": F.count(F.lit(1)),
        },
        final={
            "revenue": unscale(dsum("r6"), round_to=2).cast("double"),
            # coalesce: a zero-match scan leaves the global agg with no
            # partials — count(*) semantics say 0, not NULL.
            "n_items": F.coalesce(F.sum("__n"), F.lit(0).cast("bigint")),
        },
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="3-way equi-join + agg + top-k (SURVEY §2.3/2.6; TPC-H Q3)",
    tags=("join", "topk", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-06-30 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # Single-level int64 sum: groups are orderkeys (<= 7 lines per
        # order by schema construction at ANY scale), so the scaled sum
        # is bounded ~7e11 — no two-level split needed; the unscale
        # stays a decimal divide for round-half exactness.
        .agg(
            unscale(
                F.sum(money_x_rate6("l_extendedprice", "l_discount")).cast("decimal(38,0)"),
                round_to=2,
            ).cast("double").alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_volume",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="6-way join incl. compound key + broadcast dims (SURVEY §2.3; TPC-H Q5)",
    tags=("join", "agg", "bench"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join ORDER is the optimization Catalyst won't do without CBO
    # stats: apply the region selection to the DIMENSIONS first
    # (region->nation->customer/supplier, all broadcast) so orders and
    # then lineitem shrink ~5x BEFORE the fact-fact join — measured
    # 2.6 s -> 1.1 s at sf1. The late-filter formulation dragged every
    # order of every region through the lineitem join.
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia_n = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(asia_n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(asia_n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t["orders"].join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    joined = (
        t["lineitem"]
        .join(orders.select("o_orderkey", "c_nationkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return two_level_agg(
        joined,
        ["n_name"],
        partial={
            "r6": F.sum(money_x_rate6("l_extendedprice", "l_discount")),
            "__n": F.count(F.lit(1)),
        },
        final={
            "revenue": unscale(dsum("r6"), round_to=2).cast("double"),
            "n_items": F.sum("__n"),
        },
    )


@query(
    "q_left_join_agg",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="LEFT OUTER join preserving unmatched left rows (SURVEY §2.3)",
    tags=("join",),
)
def q_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "q_right_join",
    oracle="""
    SELECT n_name, CAST(count(s_suppkey) AS BIGINT) AS n_suppliers
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="RIGHT OUTER join (SURVEY §2.3)",
    tags=("join",),
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "nation")
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "q_full_outer_join",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
           CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
    doc="FULL OUTER join with coalesced keys (SURVEY §2.3)",
    tags=("join",),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    supp = t["supplier"].groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 150000
    )
    """,
    doc="LEFT SEMI join / EXISTS decorrelation (SURVEY §2.3)",
    tags=("join", "subquery"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    big_f = t["orders"].filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
    return (
        t["customer"]
        .join(big_f, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
    doc="LEFT ANTI join / NOT EXISTS (SURVEY §2.3)",
    tags=("join", "subquery"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    partial = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(partial, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r_name, rf AS returnflag
    FROM region
    CROSS JOIN (SELECT DISTINCT l_returnflag AS rf FROM lineitem)
    """,
    doc="CROSS join (SURVEY §2.3)",
    tags=("join",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "region", "lineitem")
    flags = t["lineitem"].select(F.col("l_returnflag").alias("rf")).distinct()
    return t["region"].crossJoin(flags).select("r_name", F.col("rf").alias("returnflag"))


@query(
    "q_nonequi_join",
    oracle="""
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_richer_customers
    FROM supplier
    JOIN customer ON c_acctbal > s_acctbal AND c_nationkey = s_nationkey
    GROUP BY s_suppkey, s_name
    """,
    doc="theta / non-equi join predicate (SURVEY §2.3 nested-loop row)",
    tags=("join",),
)
def q_nonequi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "customer")
    return (
        t["supplier"]
        .join(
            t["customer"],
            (F.col("c_acctbal") > F.col("s_acctbal"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (SURVEY §2.7)",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey % 100 AS bucket FROM customer
    EXCEPT
    SELECT s_suppkey % 50 FROM supplier
    """,
    doc="EXCEPT / subtract (SURVEY §2.7)",
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived buckets (custkey%100 vs suppkey%50) guarantee a non-empty
    difference at every scale factor — plain nationkey EXCEPT goes empty
    once each nation has both customers and suppliers (sf>=0.01), which
    would leave the driver gate a hollow 0-row pass."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select((F.col("c_custkey") % 100).alias("bucket"))
        .subtract(t["supplier"].select((F.col("s_suppkey") % 50).alias("bucket")))
    )


@query(
    "q_union_all",
    oracle="""
    SELECT kind, CAST(count(*) AS BIGINT) AS n, round(sum(acctbal), 2) AS total_bal
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    )
    GROUP BY kind
    """,
    doc="UNION ALL (SURVEY §2.7)",
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    u = t["customer"].select(F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal")).unionAll(
        t["supplier"].select(F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal"))
    )
    return u.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("acctbal"), 2).alias("total_bal")
    )


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT ALL bag semantics (SURVEY §2.7)",
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT ALL bag semantics (SURVEY §2.7)",
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


# ---------------------------------------------------------------------------
# Distinct / sort / limit / offset (SURVEY §2.2, §2.6)
# ---------------------------------------------------------------------------


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT projection (SURVEY §2.2)",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer")
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    doc="ORDER BY + LIMIT fused to TakeOrderedAndProject (SURVEY §2.6)",
    tags=("sort", "topk"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 40
    """,
    doc="LIMIT + OFFSET over total order (SURVEY §2.6)",
    tags=("sort",),
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].orderBy("o_orderkey").offset(40).limit(20).select("o_orderkey", "o_orderstatus")


@query(
    "q_sort_nulls",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price
    FROM orders
    ORDER BY maybe_price DESC NULLS LAST, o_orderkey
    LIMIT 25
    """,
    doc="multi-key sort with explicit NULLS LAST (SURVEY §2.6; Spark/DuckDB default null order differs)",
    tags=("sort",),
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice"))
    return (
        t["orders"]
        .select("o_orderkey", maybe.alias("maybe_price"))
        .orderBy(F.col("maybe_price").desc_nulls_last(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_set_ops",
    oracle="""
    SELECT op, nationkey, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT 'intersect' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'intersect_all', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'except', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'except_all', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'union_distinct', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'union_all', c_nationkey FROM customer
      UNION ALL
      SELECT 'union_all', s_nationkey FROM supplier
      UNION ALL
      SELECT 'distinct', nationkey FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer)
    )
    GROUP BY op, nationkey
    """,
    doc="every §2.7 set operation + §2.2 DISTINCT in one result: tagged branches, per-op multiplicity counts (bag semantics visible in n)",
    tags=("setop",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One driver-gate row covering INTERSECT [ALL] / EXCEPT [ALL] /
    UNION [ALL|DISTINCT] / DISTINCT together; the fine-grained
    per-operator queries remain registered below for local runs."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "nationkey")

    u = (
        tag(c.intersect(s), "intersect")
        .unionByName(tag(c.intersectAll(s), "intersect_all"))
        .unionByName(tag(c.subtract(s), "except"))
        .unionByName(tag(c.exceptAll(s), "except_all"))
        .unionByName(tag(c.union(s).distinct(), "union_distinct"))
        .unionByName(tag(c.unionAll(s), "union_all"))
        .unionByName(tag(c.distinct(), "distinct"))
    )
    return u.groupBy("op", "nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_sort_paging",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price
    FROM orders
    ORDER BY maybe_price DESC NULLS LAST, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    doc="multi-key ORDER BY with explicit NULLS LAST + LIMIT/OFFSET paging in one driver-gate row (SURVEY §2.6)",
    tags=("sort",),
)
def q_sort_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice"))
    return (
        t["orders"]
        .select("o_orderkey", maybe.alias("maybe_price"))
        .orderBy(F.col("maybe_price").desc_nulls_last(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@query(
    "q_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           CAST(o_custkey AS BIGINT)  AS custkey,
           CAST(o_orderkey AS BIGINT) AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
           round(o_totalprice, 2)     AS latest_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    """,
    doc="DISTINCT ON (Postgres-style first-row-per-key; DataFusion supports "
    "it since v33, reference-reachable via `sql:`): newest order per "
    "customer with a deterministic (o_orderdate DESC, o_orderkey) "
    "tie-break. Spark has no DISTINCT ON, so the engine spells it as the "
    "canonical row_number()=1 emulation — a LITERAL rank bound, so "
    "InferWindowGroupLimit keeps per-partition top-1 heaps map-side and "
    "only |keys| rows reach the exchange (SURVEY §2.2 DISTINCT family)",
    tags=("relational",),
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            F.col("o_orderkey").cast("bigint").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
    )
