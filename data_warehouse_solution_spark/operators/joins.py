"""Join operators: every join type the delegated warehouse surface
needs (SURVEY §2.B "Joins" row), declared through the DataFrame API.

Scale notes (100 TB): dimension sides (region/nation/supplier/part/
customer) are explicitly ``F.broadcast``-hinted — they stay bounded
while facts grow, so no fact-side shuffle is ever spent on them. The
fact-fact join (orders ⋈ lineitem) shuffles on the join key, which
AQE re-plans at runtime (skew split, partition coalescing). The as-of
join is composed from an equi-join + window — the classic Spark
formulation when no native as-of exists; at extreme scale the same
shape works bucketed on the equi key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dec, dsum, one_minus
from ..registry import query
from ..tables import load_tables


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: 3-way join, filtered, grouped, top-10 by revenue.

    customer (small dim) is broadcast; orders ⋈ lineitem shuffles on
    the order key. Sort keys include l_orderkey so top-10 is total-
    ordered and engine-deterministic.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    revenue = (dec("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style: 6-way star join; all five dims broadcast, one
    fact-fact shuffle (orders ⋈ lineitem)."""
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    revenue = (dec("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")
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
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                     AND o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a filtered right side so null-extension
    actually occurs (customers with no late-2001 orders)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    late = t["orders"].filter(F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp"))
    return (
        t["customer"]
        .join(late, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_orderstatus, c_name
    FROM customer
    RIGHT JOIN orders ON c_custkey = o_custkey AND c_mktsegment = 'AUTOMOBILE'
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every order survives; non-AUTOMOBILE
    customers null out."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("c_mktsegment") == "AUTOMOBILE"),
            "right",
        )
        .select("o_orderkey", "o_orderstatus", "c_name")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT a.c_custkey AS left_key, b.o_custkey AS right_key
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) a
    FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderstatus = 'F') b
      ON a.c_custkey = b.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two partially-overlapping key sets."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = t["customer"].filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
    )
    return a.join(b, a["c_custkey"] == b["o_custkey"], "full").select(
        a["c_custkey"].alias("left_key"), b["o_custkey"].alias("right_key")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS: customers having a >400k order."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS: customers with no 2001+ orders
    (right side filtered so the anti set is non-trivial)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two bounded dimension tables."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_parts_in_budget
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal / 4 AND s_acctbal
    GROUP BY s_suppkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: parts whose price falls in a
    supplier-specific band. Spark executes this as a broadcast
    nested-loop join — correct strategy, since one side is a bounded
    dimension. A fact-fact range join would first bucketize the range
    key into an equi-join key (see the as-of join below)."""
    t = load_tables(spark, sf_dir, ("supplier", "part"))
    cond = (F.col("p_retailprice") >= F.col("s_acctbal") / 4) & (
        F.col("p_retailprice") <= F.col("s_acctbal")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["part"]), cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_parts_in_budget"))
    )


@query(
    "join_asof_latest_order",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, ts, o_orderkey, o_orderdate
    FROM pairs WHERE rn = 1
    """,
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark SQL operator): each event matched to
    the latest order of the same user at-or-before the event time.

    Union-and-scan formulation: orders and events are unioned into one
    per-user timeline, sorted by (time, side, key); a running
    last-non-null carries each order forward to the events after it.
    Shuffle volume is |events| + |orders| rows keyed on user — the
    scalable as-of shape — versus the naive equi-join + backward
    predicate whose intermediate is every (event, earlier-order) PAIR
    (quadratic in per-user history; measured 3x slower at sf0.1 and
    diverging with history length).

    Ordering guarantees: orders sort before events at the same
    timestamp (inclusive <=); equal-date orders sort by o_orderkey so
    the LAST one carried forward is the max key — deterministic,
    matching the oracle's DESC/DESC row_number tie-break.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    od = t["orders"].select(
        F.col("o_custkey").alias("u"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct("o_orderkey", "o_orderdate").alias("ord"),
    )
    ev = t["events"].select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast("struct<o_orderkey:bigint,o_orderdate:timestamp>").alias("ord"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("t", "is_event", F.col("ord.o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        od.unionByName(ev)
        .withColumn("latest", F.last("ord", ignorenulls=True).over(w))
        .filter((F.col("is_event") == 1) & F.col("latest").isNotNull())
        .select(
            "event_id",
            "ts",
            F.col("latest.o_orderkey").alias("o_orderkey"),
            F.col("latest.o_orderdate").alias("o_orderdate"),
        )
    )


# salt fan-out for the explicit skew-mitigation join. At 100 TB this is
# sized from observed key-frequency stats (enough salts that the
# hottest key's per-task slice fits the shuffle-partition budget).
_N_SALTS = 8

_SALTED_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lineitems,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@query("join_skew_salted", oracle=_SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join executed with EXPLICIT key salting — the
    manual skew-mitigation pattern for when one join key is hot enough
    to overwhelm a single shuffle partition (AQE's skew-join split
    handles most cases at runtime; explicit salting is the lever when
    the skew is in the *build* of a single key's hash bucket, or on
    engines/stages AQE doesn't cover). Probe side (lineitem) gets a
    deterministic salt from its own key hash; build side (orders,
    filtered) is replicated once per salt with explode — so every
    (key, salt) pair meets exactly one build copy and the result is
    provably identical to the unsalted join (the oracle IS the
    unsalted join). Shuffle keys become (key, salt): a hot key now
    spreads over _N_SALTS partitions at the cost of replicating the
    build side x_N_SALTS — the standard trade."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].select(
        "l_orderkey",
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_N_SALTS)).cast("int").alias("salt"),
    )
    orders = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "salt",
            F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)).cast("array<int>")),
        )
    )
    joined = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"]) & (li["salt"] == orders["salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lineitems"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )


# bucket width for the banded range join, in microseconds (120 s)
_BAND_US = 120_000_000

_RANGE_BANDED_ORACLE = f"""
SELECT a.event_id AS signup_id, b.event_id AS purchase_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.event_type = 'signup' AND b.event_type = 'purchase'
 AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND {_BAND_US}
"""


@query("join_range_banded", oracle=_RANGE_BANDED_ORACLE)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact range join via band bucketing — the shuffle-based
    scale path that replaces a broadcast nested-loop join when BOTH
    sides are large (contrast ``join_theta_range``, where one side is
    a bounded dimension and broadcast-NL is the right call).

    Each purchase lands in one 120 s time bucket; each signup is
    emitted into its own bucket and the next (a window no wider than
    the bucket can only span two), so a plain equi-join on the bucket
    key finds every candidate pair and an exact residual filter keeps
    the true ones. Shuffle volume is 2|left| + |right| rows keyed on
    the bucket — no cartesian anywhere in the plan, and AQE handles a
    hot bucket like any other skewed key (finer buckets are the
    manual lever). This is the standard interval-join recipe the
    as-of join (above) is the ordered cousin of.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.unix_micros("ts").alias("a_us")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.unix_micros("ts").alias("b_us")
    )
    a_bucket = F.floor(F.col("a_us") / _BAND_US).cast("long")
    a2 = a.withColumn(
        "bucket", F.explode(F.array(a_bucket, a_bucket + F.lit(1)))
    )
    b2 = b.withColumn("bucket", F.floor(F.col("b_us") / _BAND_US).cast("long"))
    delta = F.col("b_us") - F.col("a_us")
    return (
        a2.join(b2, "bucket")
        .filter(delta.between(0, _BAND_US))
        .select("signup_id", "purchase_id", delta.alias("delta_us"))
    )
