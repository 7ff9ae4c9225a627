"""Aggregation operators: DISTINCT, multi-agg, HAVING, ROLLUP/CUBE/
GROUPING SETS, pivot, exact + approximate distinct counts
(SURVEY §2.B "Aggregation" row).

Scale notes: every groupBy here is a two-phase hash aggregate (map-
side partial + reduce-side final) — the only rows crossing the wire
are per-group partials. ``count(DISTINCT x)`` expands to a two-level
aggregate that Catalyst plans automatically; for 100 TB cardinality
estimation use the HLL-based ``approx_count_distinct`` (declared
rows-only: sketches are engine-specific, so no value oracle).
Variance/stddev are computed from exact decimal power sums rather
than the engines' streaming moments, because streaming moments are
accumulation-order-dependent and would flap a differential check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dec, dsum
from ..registry import query
from ..tables import load_tables


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst expands to
    a multi-phase plan automatically)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_stats_exact",
    oracle="""
    SELECT l_linestatus,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           SQRT((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev from exact power sums (engine-invariant:
    quantities are integer-valued, so sum and sum-of-squares are exact
    decimals; the final sqrt is one deterministic double op)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    s1 = F.sum(dec("l_quantity")).cast("double")
    s2 = F.sum(dec(F.col("l_quantity") * F.col("l_quantity"))).cast("double")
    n = F.count("*")
    return li.groupBy("l_linestatus").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        (s1 / n).alias("avg_qty"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("stddev_qty"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per-(flag,status), per-flag subtotal, grand total."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum(dec("l_extendedprice"), "total_price")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           GROUPING(o_orderstatus) AS g_status
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY n
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with the GROUPING() indicator (SQL path —
    the DataFrame API has no grouping-sets builder; Spark SQL does)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               GROUPING(o_orderstatus) AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY n
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) > 40 AND SUM(l_quantity) > 1100
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING == post-aggregation filter."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(dec("l_quantity"), "total_qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter((F.col("n_lines") > 40) & (F.col("_raw_qty") > 1100))
        .drop("_raw_qty")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list — at scale
    always pass the pivot values so Spark skips the discovery pass)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@query("agg_approx_distinct")  # engine-specific sketch: rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB-scale
    cardinality estimator. No value oracle (sketches differ across
    engines by design); the unit test asserts relative error vs the
    exact count instead."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear
    interpolation over the sorted group; rounded to absorb last-ulp
    interpolation differences). At 100 TB swap to percentile_approx —
    declared separately rows-only."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.max("o_totalprice").alias("max_price"),
    )
