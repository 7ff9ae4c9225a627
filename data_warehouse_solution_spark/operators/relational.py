"""Core relational operators: scan, filter, project, aggregate, sort.

This is the analytical surface the reference delegates to its
warehouse backend (SQL command whitelist at ``pipeline.py:110-114``
includes SELECT); here it is native Spark. Every query is declared
through the DataFrame API so Catalyst performs predicate pushdown,
column pruning and partial aggregation — verified via
``explain("formatted")`` in tests.

Scale notes: the flagship aggregation is a two-phase (partial/final)
hash aggregate over the fact table with only the two low-cardinality
group keys shuffled — the shape that scales linearly to 100 TB. No
driver-side collection happens in any operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dec, dsum, one_minus, one_plus
from ..registry import query
from ..tables import load_tables

# Cutoff chosen against the fixture's shipdate range (1995-01..2001-11,
# see FIXTURES.md) to filter roughly the TPC-H Q1 fraction.
_Q1_CUTOFF = "1998-09-02"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                              AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
                         AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filtered scan -> 8-agg groupBy.

    Reference parity: this is the canonical warehouse query shape the
    reference assumes Dremio serves after its loader runs
    (``pipeline.py:112`` whitelists SELECT). Decimal casts make the
    sums engine-exact (see ``functions.exactmath``).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    disc_price = (dec("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")
    charge = (disc_price * one_plus("l_tax")).cast("decimal(24,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
