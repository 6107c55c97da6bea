"""Recursive CTEs and pivot/unpivot reshaping.

``WITH RECURSIVE`` is part of the reference's user-reachable SQL
surface: DataFusion 43 executes recursive CTEs (sqlparser parses them,
`datafusion/physical-plan` has `RecursiveQueryExec`), and the reference
forwards arbitrary `sql:` strings to it (`src/main.rs:43`). Spark 4
executes recursive CTEs natively (UnionLoop), so the operator is
declared, not hand-looped — the iteration happens inside the engine on
executors, which is the only formulation that survives a 1000-executor
cluster.

UNPIVOT is an *extension* (DataFusion 43 has no unpivot exec): Spark
lowers the clause to an Expand node — one output row per (input row x
metric), no shuffle — scale-safe. The pivot direction lives in
`plans/aggregates.py` (`q_pivot_conditional`, `q_pivot_api`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE months(mi) AS (
      SELECT 0
      UNION ALL
      SELECT mi + 1 FROM months
      WHERE mi + 1 <= (
        SELECT CAST(datediff('month',
                             date_trunc('month', CAST(min(o_orderdate) AS DATE)),
                             date_trunc('month', CAST(max(o_orderdate) AS DATE))) AS INT)
        FROM orders)
    ),
    anchor AS (
      SELECT date_trunc('month', CAST(min(o_orderdate) AS DATE)) AS d0 FROM orders
    ),
    spine AS (
      SELECT d0 + to_months(mi) AS month_start FROM months CROSS JOIN anchor
    ),
    per_month AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
             count(*) AS n_orders,
             sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT strftime(s.month_start, '%Y-%m-%d') AS month,
           CAST(coalesce(p.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(p.rev, 0) AS DOUBLE) AS revenue
    FROM spine s LEFT JOIN per_month p ON s.month_start = p.month_start
    """,
    doc="WITH RECURSIVE month spine (calendar gap-fill): data-driven recursion depth "
    "via a scalar subquery in the recursive term, LEFT-joined to per-month order "
    "aggregates — DataFusion 43 executes this via RecursiveQueryExec and the "
    "reference reaches it through `sql:` strings (src/main.rs:43); Spark 4 runs "
    "the loop engine-side (UnionLoop), no driver iteration",
    tags=("sql-surface", "recursive"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders")
    # The spine bounds are two scalars (first month + month count).
    # Collect them once and inject as literals: Spark re-evaluates
    # non-recursive subplans referenced by the recursive term on EVERY
    # iteration, so an inline scalar subquery re-scanned orders ~80
    # times (measured 15 s at sf1; literal-bounded, ~1.5 s — the
    # UnionLoop itself is ~11 ms/step). One pruned min/max scan +
    # O(1) driver memory, the same index-constant pattern as
    # operators/similarity.py's query vectors. The recursion itself
    # still runs engine-side.
    b = spark.sql(
        """
        SELECT date_format(trunc(CAST(min(o_orderdate) AS DATE), 'MM'), 'yyyy-MM-dd') AS d0,
               CAST(months_between(trunc(CAST(max(o_orderdate) AS DATE), 'MM'),
                                   trunc(CAST(min(o_orderdate) AS DATE), 'MM')) AS INT) AS mx
        FROM orders
        """
    ).collect()[0]
    return spark.sql(
        f"""
        WITH RECURSIVE months(mi) AS (
          SELECT 0
          UNION ALL
          SELECT mi + 1 FROM months WHERE mi + 1 <= {int(b.mx)}
        ),
        spine AS (
          SELECT add_months(DATE'{b.d0}', mi) AS month_start FROM months
        ),
        per_month AS (
          SELECT trunc(CAST(o_orderdate AS DATE), 'MM') AS month_start,
                 count(*) AS n_orders,
                 sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY trunc(CAST(o_orderdate AS DATE), 'MM')
        )
        SELECT date_format(s.month_start, 'yyyy-MM-dd') AS month,
               CAST(coalesce(p.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(p.rev, 0) AS DOUBLE) AS revenue
        FROM spine s LEFT JOIN per_month p ON s.month_start = p.month_start
        """
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT c_nationkey AS nk,
             CAST(count(*) AS DOUBLE) AS n_cust,
             CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
             round(CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*), 4) AS avg_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT nk, 'n_cust' AS metric, n_cust AS val FROM wide
    UNION ALL SELECT nk, 'total_bal' AS metric, total_bal AS val FROM wide
    UNION ALL SELECT nk, 'avg_bal' AS metric, avg_bal AS val FROM wide
    """,
    doc="UNPIVOT (wide->long): per-nation metric columns melted to (metric, val) "
    "rows via Spark's UNPIVOT clause — a Generate/Expand node, one output row "
    "per (input row x metric), no shuffle; oracle is the UNION ALL expansion",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT nk, metric, val FROM (
          SELECT c_nationkey AS nk,
                 CAST(count(*) AS DOUBLE) AS n_cust,
                 CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
                 round(CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*), 4) AS avg_bal
          FROM customer GROUP BY c_nationkey
        ) UNPIVOT (val FOR metric IN (n_cust, total_bal, avg_bal))
        """
    )


@query(
    "q_values_inline",
    oracle="""
    SELECT v.code, CAST(count(*) AS BIGINT) AS n_nations
    FROM nation n
    JOIN (VALUES (0, 'AFR'), (1, 'AME'), (2, 'ASI'), (3, 'EUR'), (4, 'MEA'))
         AS v(rk, code)
      ON n.n_regionkey = v.rk
    GROUP BY v.code
    """,
    doc="inline VALUES relation joined to a table — the SQL row-constructor "
    "surface (sqlparser/DataFusion execute VALUES lists; reference-reachable "
    "via sql: strings). Spark plans the literal relation as a LocalRelation, "
    "broadcast to the join",
    tags=("sql-surface",),
)
def q_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT v.code, count(*) AS n_nations
        FROM nation n
        JOIN (VALUES (0, 'AFR'), (1, 'AME'), (2, 'ASI'), (3, 'EUR'), (4, 'MEA'))
             AS v(rk, code)
          ON n.n_regionkey = v.rk
        GROUP BY v.code
        """
    )
