"""The remaining TPC-H query shapes (Q8/Q9/Q11/Q12/Q13/Q16/Q19/Q20/
Q21/Q22), adapted to the fixture's column subset — together with
``tpch_style.py`` this completes all 22 TPC-H workload shapes
(SURVEY §2.B: the full analytical surface the reference delegates to
its warehouse backend).

Fixture adaptations (the driver data has no partsupp table, no
commit/receipt dates, no shipmode/container/phone columns):

- Q8/Q9: supplycost → ``p_retailprice``-based cost; market share and
  profit keep their join-tree + conditional-agg shapes.
- Q11: partsupp value → lineitem revenue per part; the scalar
  threshold subquery (value > fraction of total) is preserved.
- Q12: shipmode → ``l_returnflag``; late-shipment predicate uses
  ``l_shipdate`` vs ``o_orderdate``.
- Q13: comment filter → order-priority filter; the two-level
  aggregate (orders per customer → customers per count) is exact.
- Q16: supplier-per-part counting moves to the lineitem fact.
- Q19: disjunctive brand/size/quantity predicate blocks, unchanged
  in structure.
- Q20/Q21: the EXISTS / NOT-EXISTS correlation chains are kept,
  re-expressed over shipped quantities and ship-date ordering.
- Q22: phone-prefix membership → market-segment membership; the
  "positive-balance average" scalar subquery and the anti-join on
  orders are structurally identical.

Scale notes: every dimension join is broadcast; the lineitem fact
shuffles once per aggregate key, and the semi/anti joins run as
broadcast semi-joins where the filtered build side is small. All
money math is exact DECIMAL (see ``..functions.exactmath``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dec, dsum, one_minus
from ..registry import query
from ..tables import load_tables

_REV_SQL = """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(18,4))"""


def _rev():
    return (dec("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")


@query(
    "q8_market_share",
    oracle=f"""
    WITH region_orders AS (
      SELECT YEAR(o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM region_orders
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: one nation's revenue
    share within a region's order volume, by year. Six-way join tree
    with every dimension broadcast; the conditional-sum / sum division
    happens on exact decimal sums."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "supplier")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    nat1 = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat1).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))
                    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%' OR p_type LIKE '%PROMO%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit by supplier nation and
    order year. supplycost is adapted to half retail price (no
    partsupp in the fixture); the join tree and exact-decimal profit
    expression keep the Q9 shape."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "orders"))
    cost = (dec("p_retailprice") * F.lit(0.5).cast("decimal(18,2)") * dec("l_quantity")).cast(
        "decimal(18,4)"
    )
    profit = _rev() - cost
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(
                    F.col("p_name").like("%red%") | F.col("p_type").like("%PROMO%")
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, "profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                           AS DECIMAL(18,4))) AS DOUBLE) AS value,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      AS DECIMAL(18,4))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, value
    FROM part_value
    WHERE value > (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM part_value)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock: per-part value restricted to
    one nation's suppliers, kept only where the value exceeds a
    fraction of the total (scalar aggregate subquery reused against
    its own derivation — the classic Q11 self-threshold)."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    part_value = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["supplier"]
                .join(
                    t["nation"].filter(F.col("n_name") == "NATION_2"),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                    "left_semi",
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(dsum(_rev(), "value"), F.sum(_rev()).alias("value_dec"))
    )
    # threshold from the EXACT decimal total (summing the doubles
    # would re-introduce engine-specific accumulation order at the
    # keep/drop boundary)
    threshold = part_value.agg(
        (F.sum("value_dec").cast("double") * 0.001).alias("thr")
    )
    return (
        part_value.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select(F.col("l_partkey").alias("partkey"), "value")
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-priority tally: late-shipped lines
    (shipdate after orderdate, adapted from commit/receipt dates)
    split by order priority via conditional counts."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: left outer
    join (customers with zero orders count as 0), then a second
    aggregate over the counts — the two-level groupBy shape."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier counts per part group (distinct-count
    over an excluded-brand/type/size selection; the partsupp relation
    is adapted to observed lineitem supplier-part pairs)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("STANDARD%")
        & F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive-predicate revenue: three OR'd
    brand/size/quantity blocks over a part join — the mixed
    join-filter Catalyst pushes into the join condition."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    q = F.col("l_quantity")
    block = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 40))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 50))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(block)
        .agg(dsum(_rev(), "revenue"))
    )


@query(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    ORDER BY s_suppkey
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style promotion candidates: suppliers who shipped
    more than a threshold of the promoted parts in the window (IN over
    a grouped HAVING subquery → aggregate + broadcast semi-join; the
    partsupp availability clause is adapted to shipped quantity)."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "part"))
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH marked AS (
      SELECT l_orderkey, l_suppkey, l_shipdate,
             MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS last_ship,
             COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supps
      FROM lineitem
    )
    SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
    FROM marked
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
      AND n_supps > 1
      AND l_shipdate = last_ship
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style suppliers who kept multi-supplier orders
    waiting: the EXISTS (another supplier on the order) / NOT-EXISTS
    (nobody shipped later) correlation pair is expressed as one
    window pass over the order partition (last-shipper in an order
    with >1 distinct suppliers), which is the scalable single-shuffle
    form of the double correlated subquery."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    w = Window.partitionBy("l_orderkey")
    marked = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("last_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
    )
    nations = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        marked.filter((F.col("n_supps") > 1) & (F.col("l_shipdate") == F.col("last_ship")))
        .join(F.broadcast(nations), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY'))
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style dormant high-balance customers: above-average
    balance (scalar subquery over the positive-balance population),
    no RECENT orders (anti join against the last window of order
    history — every fixture customer has some order, so dormancy is
    time-bounded), counted per segment (phone prefix adapted to
    market segment)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    in_seg = t["customer"].filter(F.col("c_mktsegment").isin(segs))
    # exact-decimal sum / count instead of AVG(double): the average
    # feeds a keep/drop threshold, so it must be bit-identical across
    # engines regardless of accumulation order
    avg_bal = in_seg.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        in_seg.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )
