"""Warehouse mutation & time-series patterns (SURVEY §2.B DDL/DML row
+ §7 hard-parts): MERGE/upsert and SCD2 emulated without a
transactional table format, and time-bucket gap-filling.

DELETE/UPDATE/MERGE need Delta/Iceberg for in-place semantics; on
plain parquet the engine-correct pattern is read -> combine ->
overwrite, expressed here as pure transformations (the overwrite is
the caller's ``df.write.mode("overwrite")`` — see ingest.ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, register_views


@query(
    "dml_upsert_emulation",
    oracle="""
    WITH updates AS (
      SELECT c_custkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.5 AS DECIMAL(18,2)) AS DOUBLE)
               AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT 999001 AS c_custkey, CAST(42.0 AS DOUBLE) AS c_acctbal,
             'MACHINERY' AS c_mktsegment
    )
    SELECT c_custkey, c_acctbal, c_mktsegment, is_updated FROM (
      SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment, 1 AS is_updated FROM updates u
      UNION ALL
      SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, 0 AS is_updated
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    ) t
    """,
)
def dml_upsert_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert on plain parquet: updates win via anti-join +
    union (matched rows replaced, unmatched inserted, rest carried
    over). One broadcastable update set -> no fact-side shuffle; at
    100 TB partition-prune the target so only touched partitions are
    rewritten."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .withColumn(
            "c_acctbal",
            (
                F.col("c_acctbal").cast("decimal(18,2)") * F.lit(1.5).cast("decimal(18,2)")
            ).cast("double"),
        )
        .unionByName(
            spark.createDataFrame(
                [(999001, 42.0, "MACHINERY")], ["c_custkey", "c_acctbal", "c_mktsegment"]
            )
        )
    )
    kept = c.join(F.broadcast(updates.select("c_custkey")), "c_custkey", "left_anti")
    return updates.withColumn("is_updated", F.lit(1)).unionByName(
        kept.withColumn("is_updated", F.lit(0))
    )


@query(
    "scd2_order_status_history",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate,
             LAG(o_orderstatus) OVER w AS prev_status,
             LEAD(o_orderdate) OVER w AS next_change
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
           COALESCE(next_change, TIMESTAMP '2260-12-31 00:00:00') AS valid_to,
           CASE WHEN next_change IS NULL THEN 1 ELSE 0 END AS is_current
    FROM ordered
    WHERE prev_status IS DISTINCT FROM o_orderstatus
    """,
)
def scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from an event log:
    collapse consecutive equal statuses, emit [valid_from, valid_to)
    intervals with an is_current flag. Window + null-safe inequality
    (IS DISTINCT FROM <=> Spark eqNullSafe negation).

    The open-interval sentinel is 2260-12-31, not the conventional
    9999-12-31: the comparison pipeline (Arrow/pandas datetime64[ns])
    tops out at 2262-04-11, and a 9999 sentinel makes toPandas raise
    ArrowInvalid — same semantics, representable everywhere."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
        F.lead("o_orderdate").over(w).alias("next_change"),
    )
    return (
        ordered.filter(~F.col("prev_status").eqNullSafe(F.col("o_orderstatus")))
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("valid_from"),
            F.coalesce(
                F.col("next_change"), F.lit("2260-12-31 00:00:00").cast("timestamp")
            ).alias("valid_to"),
            F.when(F.col("next_change").isNull(), 1).otherwise(0).alias("is_current"),
        )
    )


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS window_start FROM bounds
    ),
    actual AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT g.window_start, COALESCE(a.n, 0) AS n_events,
           CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g LEFT JOIN actual a ON a.window_start = g.window_start
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup with gap filling: dense hourly grid
    (sequence over the observed bounds) left-joined to the actual
    bucket counts, empty buckets zero-filled and flagged. The grid is
    generated from one aggregated row — no driver-side loop."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("event_type") == "purchase"
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("window_start")
    )
    actual = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(F.count("*").alias("n"))
    actual = actual.select(F.col("w.start").alias("ws"), "n")
    return (
        grid.join(actual, grid["window_start"] == actual["ws"], "left")
        .select(
            "window_start",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


@query(
    "setop_except_distinct",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (ANSI distinct semantics — Spark df.subtract/except)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = t["customer"].select(F.col("c_custkey").alias("key"))
    b = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    return a.subtract(b)


@query(
    "window_nth_value_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    """,
)
def window_nth_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / last over the full-partition frame (the frame must
    be explicit: the default RANGE..CURRENT ROW frame makes LAST_VALUE
    degenerate — a classic SQL trap, handled identically here and in
    the oracle)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "scalar_misc_funcs",
    oracle="""
    SELECT c_custkey,
           reverse(c_name) AS name_rev,
           repeat('ab', 3) AS repeated,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           xor(CAST(c_custkey AS BIGINT), 255) AS key_xor,
           c_custkey & 15 AS key_and,
           c_custkey | 16 AS key_or,
           (c_nationkey IS NOT DISTINCT FROM 5) AS is_nation5,
           CAST(epoch(TIMESTAMP '2024-06-01 12:00:00') AS BIGINT) AS fixed_epoch,
           CAST(make_date(2024, 3, 7) AS DATE) AS made_date
    FROM customer
    """,
)
def scalar_misc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining scalar surface: reverse/repeat/translate, bitwise
    ops, null-safe equality (<=>), epoch conversion, make_date."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select(
        "c_custkey",
        F.reverse("c_name").alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.col("c_custkey").cast("bigint").bitwiseXOR(F.lit(255)).alias("key_xor"),
        F.col("c_custkey").bitwiseAND(F.lit(15)).alias("key_and"),
        F.col("c_custkey").bitwiseOR(F.lit(16)).alias("key_or"),
        F.col("c_nationkey").eqNullSafe(F.lit(5)).alias("is_nation5"),
        F.unix_timestamp(F.lit("2024-06-01 12:00:00").cast("timestamp")).alias("fixed_epoch"),
        F.make_date(F.lit(2024), F.lit(3), F.lit(7)).alias("made_date"),
    )


@query(
    "dml_delete_emulation",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
    """,
)
def dml_delete_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE on plain parquet: keep the complement of the delete
    predicate and overwrite (the caller's write step). The surviving
    set is what a transactional DELETE would leave — at 100 TB,
    partition-prune first so only affected partitions rewrite
    (same note as the upsert)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    delete_pred = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 100000)
    return o.filter(~delete_pred).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "agg_filtered_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_rev,
           bit_count(CAST(MAX(l_orderkey) AS BIGINT)) AS max_key_bits
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (count_if / conditional sums) plus
    bit_count — the selective-aggregate surface. All still one
    partial+final hash aggregate; the conditions evaluate map-side."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    from ..functions.exactmath import dec

    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
        .cast("double")
        .alias("discounted_rev"),
        F.bit_count(F.max("l_orderkey").cast("bigint")).alias("max_key_bits"),
    )


_PIT_ORACLE = """
WITH hist AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         LAG(o_orderstatus) OVER w AS prev_status
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
versions AS (
  -- valid_to is the NEXT CHANGE's date, computed AFTER collapsing
  -- consecutive-equal statuses, so intervals tile the timeline with
  -- no gaps (a LEAD taken before the collapse would end a version at
  -- the next ORDER, leaving uncovered spans)
  SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           TIMESTAMP '2260-12-31 00:00:00') AS valid_to
  FROM hist
  WHERE prev_status IS DISTINCT FROM o_orderstatus
),
facts AS (
  SELECT o.o_custkey, l.l_returnflag, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT v.status AS status_at_ship, f.l_returnflag,
       COUNT(*) AS n_lineitems
FROM facts f
LEFT JOIN versions v
  ON f.o_custkey = v.o_custkey
 AND f.l_shipdate >= v.valid_from
 AND f.l_shipdate < v.valid_to
GROUP BY 1, 2
"""


@query("scd2_point_in_time_join", oracle=_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each lineitem fact picks the
    SCD2 status version of its ordering customer that was valid at
    ship date — the canonical fact-to-versioned-dimension join every
    warehouse needs for historically-accurate reporting.

    The oracle states it as the textbook interval join
    (``valid_from <= ts < valid_to``); the Spark plan deliberately
    does NOT: an inequality join is a pair blowup (every fact x every
    version of its key before pruning). Instead: union the version
    CHANGE STREAM with the facts on one (key, ts) timeline, one
    window pass takes the last version boundary at or before each
    fact (change rows sort before fact rows on ts ties; same-ts
    version flips tie-break by o_orderkey exactly like the SCD2
    builder) — a single hash exchange on the customer key, linear in
    rows, the same shape as ``join_asof_latest_order``. Facts that
    precede their customer's first version (the synthetic fixtures
    ship ~half the lineitems before their order date) surface with a
    NULL status — LEFT-join semantics, mirrored in the oracle; the
    2260 sentinel never truncates (all ship dates precede it).

    100 TB shape: no pair intermediate, no range-join fallback to
    broadcast-nested-loop; the timeline union shuffles each side once
    and the rollup reuses map-side partials.
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o, li = t["orders"], t["lineitem"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(~F.col("prev_status").eqNullSafe(F.col("o_orderstatus")))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("ts"),
            F.lit(0).alias("is_fact"),
            F.col("o_orderkey").alias("tie"),
            F.col("o_orderstatus").alias("status"),
            F.lit(None).cast("string").alias("l_returnflag"),
        )
    )
    okeys = o.select("o_orderkey", "o_custkey")
    facts = (
        li.join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            F.col("o_custkey").alias("k"),
            F.col("l_shipdate").alias("ts"),
            F.lit(1).alias("is_fact"),
            F.lit(None).cast("long").alias("tie"),
            F.lit(None).cast("string").alias("status"),
            "l_returnflag",
        )
    )
    timeline = Window.partitionBy("k").orderBy(
        "ts", "is_fact", F.col("tie").asc_nulls_last()
    )
    tagged = changes.unionByName(facts).withColumn(
        "status_at_ship",
        F.last("status", ignorenulls=True).over(
            timeline.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        tagged.filter(F.col("is_fact") == 1)
        .groupBy("status_at_ship", "l_returnflag")
        .agg(F.count("*").alias("n_lineitems"))
    )
