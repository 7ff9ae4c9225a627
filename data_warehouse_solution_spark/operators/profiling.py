"""Table/column profiling — the ANALYZE / data-quality surface.

A warehouse needs column statistics twice over: the optimizer wants
them (row counts, NDV, min/max feed join reordering and pruning — the
same stats the COW manifest stores per file) and data teams run them
as the first quality gate on every new load (the reference's ingest
pipeline loads arbitrary user CSVs; "what actually arrived?" is the
immediate next question — reference ``pipeline.py:200-244`` loads
blind).

Two registered queries over ``orders``:

- ``profile_table_columns``: one row per column with null count,
  exact NDV, numeric min/max (timestamps as epoch seconds — string
  rendering of temporals is engine-specific, epoch is exact), and
  string min/max for VARCHAR columns. Computed in ONE scan: a single
  multi-aggregate row (Catalyst plans the multi-NDV via expand +
  partial aggregation) unpivoted with ``stack`` — no per-column
  re-scan.
- ``profile_frequent_values``: top-3 most frequent values for the
  low-cardinality string columns (rank ties broken by value, so the
  cutoff is deterministic) — the frequency-histogram half of a
  profiler.

100 TB shape: one pass, map-side partials, output rows == column
count (KBs). Exact NDV is the expensive honest version (expand
multiplies the shuffle by the profiled-column count); the sketch
alternative at scale is ``sketch_hll_mergeable``'s register partials
per column, which the docstring there covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

# (column, kind) — kind drives which min/max slot is populated
_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _oracle_branch(c: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn, mx = f"CAST(epoch(MIN({c})) AS DOUBLE)", f"CAST(epoch(MAX({c})) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms, xs = f"MIN({c})", f"MAX({c})"
    return f"""
  SELECT '{c}' AS col_name,
         COUNT(*) - COUNT({c}) AS n_nulls,
         COUNT(DISTINCT {c}) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         {ms} AS min_str, {xs} AS max_str
  FROM orders"""


_PROFILE_ORACLE = "\nUNION ALL\n".join(_oracle_branch(c, k) for c, k in _COLS)


@query("profile_table_columns", oracle=_PROFILE_ORACLE)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profile of ``orders`` (nulls, exact NDV,
    typed min/max), unpivoted to one row per column."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    aggs = []
    for c, kind in _COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__minn"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__maxn"))
        elif kind == "ts":
            aggs.append(F.unix_timestamp(F.min(c)).cast("double").alias(f"{c}__minn"))
            aggs.append(F.unix_timestamp(F.max(c)).cast("double").alias(f"{c}__maxn"))
        else:
            aggs.append(F.min(c).alias(f"{c}__mins"))
            aggs.append(F.max(c).alias(f"{c}__maxs"))
    one = o.agg(*aggs)
    branches = []
    for c, kind in _COLS:
        if kind in ("num", "ts"):
            minn, maxn = f"`{c}__minn`", f"`{c}__maxn`"
            mins, maxs = "cast(null as string)", "cast(null as string)"
        else:
            minn, maxn = "cast(null as double)", "cast(null as double)"
            mins, maxs = f"`{c}__mins`", f"`{c}__maxs`"
        branches.append(
            f"'{c}', `{c}__nulls`, `{c}__ndv`, {minn}, {maxn}, {mins}, {maxs}"
        )
    stacked = one.select(
        F.expr(
            f"stack({len(_COLS)}, {', '.join(branches)}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        )
    )
    return stacked


_FREQ_COLS = ("o_orderstatus", "o_orderpriority")
_FREQ_K = 3

_FREQ_ORACLE = "\nUNION ALL\n".join(
    f"""
  SELECT * FROM (
    SELECT '{c}' AS col_name, {c} AS value, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, {c}) AS rnk
    FROM orders GROUP BY {c}
  ) WHERE rnk <= {_FREQ_K}"""
    for c in _FREQ_COLS
)


@query("profile_frequent_values", oracle=_FREQ_ORACLE)
def profile_frequent_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 frequent values per low-cardinality column (deterministic
    tie-break by value) — the profiler's frequency histogram."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    out: DataFrame | None = None
    for c in _FREQ_COLS:
        w = Window.orderBy(F.col("n").desc(), F.col("value"))
        part = (
            o.groupBy(F.col(c).alias("value"))
            .agg(F.count("*").alias("n"))
            .select(
                F.lit(c).alias("col_name"),
                "value",
                "n",
                F.row_number().over(w).alias("rnk"),
            )
            .filter(F.col("rnk") <= _FREQ_K)
        )
        out = part if out is None else out.unionByName(part)
    return out
