"""NULL-semantics surface: the ANSI corner cases every warehouse
migration trips over (SURVEY §2.B subquery/join/window rows). The
fixtures carry no NULLs, so each query manufactures them with
``nullif`` — deterministically, so the DuckDB oracle sees the same
null pattern.

These matter for parity because they are where engines historically
DIVERGE from users' expectations, not from each other: NOT IN against
a set containing NULL matches nothing; null-safe equality joins rows
plain ``=`` drops; IGNORE NULLS analytic functions skip gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables


@query(
    "subq_not_in_null_trap",
    oracle="""
    WITH probe AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 200
    ),
    with_null AS (
      SELECT NULLIF(o_custkey, 7) AS k FROM orders WHERE o_custkey <= 50
    ),
    no_null AS (
      SELECT o_custkey AS k FROM orders WHERE o_custkey <= 50 AND o_custkey <> 7
    )
    SELECT
      (SELECT COUNT(*) FROM probe WHERE c_custkey NOT IN (SELECT k FROM with_null))
        AS n_not_in_with_null,
      (SELECT COUNT(*) FROM probe WHERE c_custkey NOT IN (SELECT k FROM no_null))
        AS n_not_in_clean
    """,
)
def subq_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs a subquery containing a NULL: three-valued logic
    makes every membership test UNKNOWN, so the with-null count is 0
    while the null-free count is positive. Both engines implement the
    ANSI rule; this query pins it so a future rewrite to an anti-join
    (which has DIFFERENT null semantics) cannot slip through."""
    c = load_tables(spark, sf_dir, ("customer", "orders"))
    probe = c["customer"].filter(F.col("c_custkey") <= 200).select("c_custkey")
    base = c["orders"].filter(F.col("o_custkey") <= 50)
    with_null = base.select(F.nullif(F.col("o_custkey"), F.lit(7)).alias("k"))
    no_null = base.filter(F.col("o_custkey") != 7).select(F.col("o_custkey").alias("k"))
    probe.createOrReplaceTempView("ns_probe")
    with_null.createOrReplaceTempView("ns_with_null")
    no_null.createOrReplaceTempView("ns_no_null")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM ns_probe
           WHERE c_custkey NOT IN (SELECT k FROM ns_with_null)) AS n_not_in_with_null,
          (SELECT COUNT(*) FROM ns_probe
           WHERE c_custkey NOT IN (SELECT k FROM ns_no_null)) AS n_not_in_clean
        """
    )


@query(
    "join_null_safe_equality",
    oracle="""
    WITH a AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders
               WHERE o_orderkey <= 400),
    b AS (SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS st FROM orders)
    SELECT COALESCE(a.st, '<null>') AS status_key, COUNT(*) AS n
    FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
    GROUP BY 1
    """,
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other, unlike plain ``=`` which silently drops them.
    Spark plans ``<=>`` as a real hash join (null-safe keys), not a
    nested loop — the property that matters when the null bucket is
    large."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderkey") <= 400).select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st_a")
    )
    b = o.select(F.nullif("o_orderstatus", F.lit("P")).alias("st_b")).distinct()
    return (
        a.join(b, F.col("st_a").eqNullSafe(F.col("st_b")))
        .groupBy(F.coalesce(F.col("st_a"), F.lit("<null>")).alias("status_key"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "window_ignore_nulls_fill",
    oracle="""
    WITH gaps AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS q
      FROM lineitem WHERE l_orderkey <= 300
    )
    SELECT l_orderkey, l_linenumber,
           LAST_VALUE(q IGNORE NULLS) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_filled
    FROM gaps
    """,
)
def window_ignore_nulls_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill with LAST_VALUE ... IGNORE NULLS: the canonical
    gap-repair idiom (sensor dropouts, sparse attributes). Every
    third line's quantity is nulled, then carried forward within the
    order. Same single shuffle as any keyed window."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    gaps = li.filter(F.col("l_orderkey") <= 300).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") % 3 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("q"),
    )
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return gaps.select(
        "l_orderkey",
        "l_linenumber",
        F.last("q", ignorenulls=True).over(w).alias("q_filled"),
    )


@query(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE q(r_regionkey, r_name, quarter_idx) AS (
      SELECT r_regionkey, r_name, 0 FROM region
      UNION ALL
      SELECT r_regionkey, r_name, quarter_idx + 1 FROM q WHERE quarter_idx < 3
    )
    SELECT r_regionkey, r_name, quarter_idx,
           CAST(CAST('1995-01-01' AS DATE) + (quarter_idx * INTERVAL '3 months') AS DATE)
             AS quarter_start
    FROM q
    """,
)
def recursive_cte_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4) — bounded row generation per
    region, the recursive twin of sequence_generation's explode form.
    Spark's recursion currently requires UNION ALL, so this covers
    the ACYCLIC/bounded recursion class; cyclic closures (connected
    components) stay on the iterative join loop
    (``curation._label_propagate``), which is also the form that
    scales past the optimizer's recursion depth."""
    t = load_tables(spark, sf_dir, ("region",))
    t["region"].createOrReplaceTempView("rcs_region")
    return spark.sql(
        """
        WITH RECURSIVE q(r_regionkey, r_name, quarter_idx) AS (
          SELECT r_regionkey, r_name, 0 FROM rcs_region
          UNION ALL
          SELECT r_regionkey, r_name, quarter_idx + 1 FROM q WHERE quarter_idx < 3
        )
        SELECT r_regionkey, r_name, quarter_idx,
               CAST(DATE'1995-01-01' + make_interval(0, quarter_idx * 3) AS DATE)
                 AS quarter_start
        FROM q
        """
    )


@query(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_val,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    WHERE event_id <= 2000
    """,
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once, then typed ``variant_get`` path extraction —
    the open-schema column pattern that replaces per-query JSON
    string re-parsing (parse once, extract many, binary-encoded).
    Output is projected back to scalars for the oracle (variant cells
    are engine-internal)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.filter(F.col("event_id") <= 2000).select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
        F.expr("try_variant_get(parse_json(props), '$.missing', 'bigint')").alias(
            "missing_val"
        ),
        F.expr("CASE WHEN try_parse_json(props) IS NULL THEN 0 ELSE 1 END").alias(
            "is_valid"
        ),
    )
