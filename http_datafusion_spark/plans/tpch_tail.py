"""TPC-H tail — Q8, Q9, Q11, Q15, Q16, Q20 analogues, completing the
full 22-query suite (reference reaches all of them through DataFusion's
SQL frontend, src/main.rs:43).

The testdata star schema has no ``partsupp`` table, so the four queries
built on it (Q9/Q11/Q16/Q20) follow the q2_min_cost_supplier convention
(plans/tpch_more.py:18): the part-supplier fact is derived from
``lineitem`` (the observed (l_partkey, l_suppkey) relationships), which
preserves each query's optimizer shape — multi-way join into aggregate
(Q9), group-by filtered by a scalar aggregate subquery (Q11), distinct
relationship count with NOT-IN exclusion (Q16), nested IN-subqueries
with a grouped HAVING (Q20).

Scale notes (100 TB design):
- every dimension join (part, supplier, customer, nation, region) is
  broadcast — the only shuffles are fact-fact joins on orderkey and the
  final group-bys;
- Q8 is composed dimension-first (enrich both fact sides with their
  broadcast dims, then one equi-join on orderkey) — the same rewrite
  that took q5 2.6 s -> 1.1 s at 10x sf, since Catalyst has no CBO
  stats to find it on its own;
- Q11's threshold is scale-free (1.2x the mean part value), so the
  query stays non-degenerate from sf0.001 to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.functions.fixedpoint import dsum, i100, money_x_rate6, two_level_agg, unscale
from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


@query(
    "q8_market_share",
    oracle="""
    SELECT yr,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY yr
    """,
    doc="TPC-H Q8 shape: one nation's market share of regional volume by year (SURVEY §2.3/2.4)",
    tags=("join", "agg", "bench"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dimension-first: each fact side is enriched with its broadcast
    # dimensions, leaving ONE shuffle join (orderkey) between two
    # pre-filtered narrow relations.
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region")
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust_side = (
        t["orders"]
        .filter(F.col("o_orderdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("o_orderkey", F.year("o_orderdate").cast("bigint").alias("yr"))
    )
    supp_side = (
        t["lineitem"]
        # filtered part is SF-linear — hint-free; the static planner still
        # picks BHJ from its size estimate at bench scale, SMJ+AQE at 100 TB
        .join(t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            "l_orderkey",
            "supp_nation",
            # int64 fixed point (functions/fixedpoint.py): the shuffled
            # fact column is a primitive long, and the sums stay in
            # whole-stage codegen instead of BigDecimal buffers.
            money_x_rate6("l_extendedprice", "l_discount").alias("vol6"),
        )
    )
    zero = F.lit(0).cast("bigint")
    joined = supp_side.join(cust_side, F.col("l_orderkey") == F.col("o_orderkey"))
    return two_level_agg(
        joined,
        ["yr"],
        partial={
            "n6": F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol6")).otherwise(zero)),
            "d6": F.sum("vol6"),
        },
        final={
            "mkt_share": F.round(
                unscale(dsum("n6")).cast("double") / unscale(dsum("d6")).cast("double"), 6
            )
        },
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, yr,
           CAST(round(sum(CAST(amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, yr
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and year; supply cost proxied by 0.6*p_retailprice (no partsupp in schema)",
    tags=("join", "agg", "bench"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    # Pure-int64 amount at scale 1e6: the true amount is an exact
    # 5-decimal rational (rev is 4-decimal, 0.6*retail*qty is
    # 5-decimal: 6*rp2*qty2/1e5), so the oracle's decimal(18,6) cast of
    # the double returns exactly this rational — see
    # functions/fixedpoint.py for the error-bound argument.
    amount6 = money_x_rate6("l_extendedprice", "l_discount") - F.lit(60).cast("bigint") * i100(
        "p_retailprice"
    ) * i100("l_quantity")
    # Direct join, NO per-order pre-aggregation: the widget filter is
    # selective (~10% of lines), so grouping by (orderkey, nation)
    # first only shrinks the join input ~1.4x while costing a THIRD
    # fact exchange (the (orderkey, nation) partitioning doesn't
    # satisfy the orderkey join, so Catalyst re-exchanges). Measured at
    # sf1: direct 1.10 s vs pre-agg 1.34 s. The broadcast-enriched
    # lineitem side shuffles narrow rows (orderkey, nation, int64
    # amount); AQE broadcast-converts the orders side when its real
    # size allows, SMJ otherwise — correct at any scale.
    li_side = (
        t["lineitem"]
        .join(
            # filtered part is SF-linear — hint-free (AQE/static estimate decides)
            t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", F.col("n_name").alias("nation"), amount6.alias("amount6"))
    )
    joined = li_side.join(
        t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return two_level_agg(
        joined,
        ["nation", F.year("o_orderdate").cast("bigint").alias("yr")],
        partial={"p6": F.sum("amount6")},
        final={"sum_profit": unscale(dsum("p6"), round_to=2).cast("double")},
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS pk,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT pk, CAST(round(val, 2) AS DOUBLE) AS part_value
    FROM ps
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 1.2 / count(*) FROM ps)
    """,
    doc="TPC-H Q11 shape: parts whose stocked value exceeds a fraction of the regional total (scalar agg subquery); part-supplier fact derived from lineitem, threshold scale-free at 1.2x mean",
    tags=("subquery", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    # The SQL surface IS the operator under test (scalar aggregate
    # subquery against a shared CTE) — Catalyst plans the CTE once per
    # branch, broadcasts the 1-row aggregate into the filter.
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS pk,
                 sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY l_partkey
        )
        SELECT pk, CAST(round(val, 2) AS DOUBLE) AS part_value
        FROM ps
        WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 1.2 / count(*) FROM ps)
        """
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue (view + scalar max subquery); exact-decimal revenue makes the equality engine-stable",
    tags=("subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_rev
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        """
    )


@query(
    "q16_supplier_relationships",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = pk
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier count per part profile with NOT-IN supplier exclusion; relationships derived from lineitem (no partsupp), complaint filter proxied by a key predicate",
    tags=("subquery", "agg"),
)
def q16_supplier_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    excluded = t["supplier"].filter(F.col("s_suppkey") % 7 == 0).select("s_suppkey")
    ps = t["lineitem"].select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")).distinct()
    return (
        ps.join(
            # filtered part is SF-linear — hint-free (AQE/static estimate decides)
            t["part"].filter(
                (F.col("p_brand") != "Brand#13")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
            ),
            F.col("p_partkey") == F.col("pk"),
        )
        .join(F.broadcast(excluded), ps["sk"] == excluded["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("sk").alias("supplier_cnt"))
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50
      )
    """,
    doc="TPC-H Q20 shape: regional suppliers who shipped large volumes of a part family (IN over a grouped-HAVING subquery); availqty threshold proxied by shipped quantity (no partsupp)",
    tags=("subquery", "join"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "nation", "region", "lineitem", "part")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            # filtered part is SF-linear — hint-free (AQE/static estimate decides)
            t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    europe = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(europe), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
