"""Set operations, sort semantics, limit/offset
(SURVEY §2.B "Set ops" and "Sort / limit / top-k" rows).

Spark `intersect`/`exceptAll` etc. match ANSI INTERSECT/EXCEPT ALL
semantics directly; the oracle SQL uses the same variants (FIXTURES.md
§4 flags the DISTINCT-vs-ALL trap).

Sort order can't be observed through the driver's order-insensitive
multiset compare, so ordering queries attach a row_number computed
over the intended order — the rank column makes the order part of the
values being compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS key, 'high_balance' AS tag FROM customer WHERE c_acctbal > 7000
    UNION ALL
    SELECT o_custkey AS key, 'big_order' AS tag FROM orders WHERE o_totalprice > 450000
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (bag union — no shuffle at all)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = (
        t["customer"]
        .filter(F.col("c_acctbal") > 7000)
        .select(F.col("c_custkey").alias("key"), F.lit("high_balance").alias("tag"))
    )
    b = (
        t["orders"]
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("key"), F.lit("big_order").alias("tag"))
    )
    return a.unionByName(b)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_acctbal > 7000
    UNION
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 450000
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — bag union then distinct shuffle."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = t["customer"].filter(F.col("c_acctbal") > 7000).select(F.col("c_custkey").alias("key"))
    b = t["orders"].filter(F.col("o_totalprice") > 450000).select(F.col("o_custkey").alias("key"))
    return a.unionByName(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (ANSI distinct semantics — Spark df.intersect)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    return a.intersect(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference preserving multiplicities
    (Spark df.exceptAll)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey AS key FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey AS key FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min of multiplicities)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("key"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("key"))
    return a.intersectAll(b)


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, discounted_bal,
           ROW_NUMBER() OVER (ORDER BY discounted_bal DESC NULLS LAST, c_custkey) AS ord
    FROM (
      SELECT c_custkey, NULLIF(ROUND(c_acctbal, 0), 0) AS discounted_bal
      FROM customer WHERE c_nationkey < 5
    ) t
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement, made observable by
    materializing the order as a row_number (the fixtures have no
    nulls, so NULLIF manufactures them)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    base = c.filter(F.col("c_nationkey") < 5).select(
        "c_custkey", F.nullif(F.round("c_acctbal", 0), F.lit(0.0)).alias("discounted_bal")
    )
    w = Window.orderBy(F.col("discounted_bal").desc_nulls_last(), F.col("c_custkey"))
    return base.withColumn("ord", F.row_number().over(w))


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET pagination under a total order."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(5)
        .limit(20)
    )
