"""Window-function operators: ranking, analytic, frames, top-k
(SURVEY §2.B "Window functions" row).

Determinism discipline for differential testing: row_number/ntile/
lag/lead are only well-defined under a TOTAL order, so every such
window orders by a unique key chain; rank/dense_rank/percent_rank/
cume_dist are tie-stable, so value ties are fine there.

Scale notes: a window partitioned by a high-cardinality key is one
shuffle on that key, then a per-partition sort — the same cost shape
as a groupBy. Windows with no PARTITION BY collapse to a single
partition and do NOT scale; none are declared here except over
bounded dimension tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dec
from ..registry import query
from ..tables import load_tables


@query(
    "window_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST()    OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-stable ranking family over price within order status."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "window_row_number_ntile",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_row_number_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + ntile under a total order (o_orderkey tiebreak)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey)     OVER w AS prev_order,
           LEAD(o_orderkey)    OVER w AS next_order,
           LAG(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER w AS prev2_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family over each customer's order history (total order
    via orderdate + orderkey)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@query(
    "window_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_3,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: 3-row moving sum + running total per customer,
    decimal-exact so frame accumulation order can't flap the check."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(base.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("moving_3"),
        F.sum(dec("o_totalprice"))
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_frame_range",
    oracle="""
    SELECT l_partkey, l_quantity,
           COUNT(*) OVER (PARTITION BY l_partkey ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS n_within_5
    FROM lineitem
    WHERE l_partkey <= 100
    """,
)
def window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers counted by VALUE distance (±5 quantity),
    not row position."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    w = Window.partitionBy("l_partkey").orderBy("l_quantity").rangeBetween(-5, 5)
    return (
        li.filter(F.col("l_partkey") <= 100)
        .select("l_partkey", "l_quantity", F.count("*").over(w).alias("n_within_5"))
    )


@query(
    "topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_nationkey, c_custkey, c_acctbal, rn
    FROM ranked WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — THE scalable top-k
    shape (shuffle by group key, per-partition sort, early filter;
    never a global sort)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


_QUALIFY_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_orderpriority, rn
"""


@query("sql_qualify_topk", oracle=_QUALIFY_SQL)
def sql_qualify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY through the SQL gate: the IDENTICAL statement text runs
    on both engines — DuckDB executes QUALIFY natively; Spark lacks
    the clause, so ``sql_gate._run_qualify`` rewrites it (predicate
    injected as a boolean select-list column, wrapped filter, helper
    dropped) into the exact plan ``topk_per_group`` hand-writes: one
    WindowExec partitioned by o_orderpriority, then the rank filter.
    The ORDER BY tail rides outside the wrapper, exercising the
    suffix re-attachment path."""
    from ..sql_gate import run_sql
    from ..tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return run_sql(spark, _QUALIFY_SQL)
