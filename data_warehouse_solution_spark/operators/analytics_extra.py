"""Additional analytics surface: collection aggregates, string
aggregation, histogram binning, correlation statistics, struct/map
construction, sequence generation, and sampling (SURVEY §2.B
aggregation/scalar rows, long tail).

Determinism notes: collection aggregates are order-nondeterministic in
any distributed engine, so both sides sort inside the group before
comparing; correlation-family moments are rounded to 6dp (magnitudes
are O(1), double error is O(1e-12)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables


@query(
    "agg_collect_list_sorted",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_custkey)), '|') AS customer_keys,
           COUNT(*) AS n
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
)
def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate: per-nation key lists, sorted in-group so
    the shuffle's arrival order can't flap the comparison. The list is
    serialized to a '|'-joined string on both sides — the driver's
    value-hash comparator can't hash raw array cells."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("c_custkey"))).alias("customer_keys"),
            F.count("*").alias("n"),
        )
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg semantics: distinct values, ordered, joined
    (composed from collect_set + array_sort + concat_ws — the portable
    deterministic form)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities")
    )


@query(
    "agg_histogram_bins",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(o_totalprice) AS bin_min,
           MAX(o_totalprice) AS bin_max
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via floor-binning — the distributed
    histogram shape (one groupBy on the bin id)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    bin_ = F.floor(F.col("o_totalprice") / 50000).alias("bin")
    return o.groupBy(bin_).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("bin_min"),
        F.max("o_totalprice").alias("bin_max"),
    )


@query(
    "agg_correlation_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qty_price_corr,
           ROUND(covar_pop(l_discount, l_tax), 6) + 0.0 AS disc_tax_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) + 0.0 AS price_per_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation family: corr / covar_pop / regression slope,
    rounded to absorb accumulation-order noise (values are O(1)-O(1e3),
    double error O(1e-9) relative)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # `+ 0.0` normalizes IEEE negative zero (a rounded tiny negative
    # covariance is -0.0 in one engine, 0.0 in the other)
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + 0.0).alias("qty_price_corr"),
        (F.round(F.covar_pop("l_discount", "l_tax"), 6) + 0.0).alias("disc_tax_covar"),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6) + 0.0).alias("price_per_qty"),
    )


@query(
    "scalar_struct_map_funcs",
    oracle="""
    WITH built AS (
      SELECT c_custkey,
             struct_pack(seg := c_mktsegment, bal := c_acctbal) AS profile,
             MAP([c_mktsegment], [c_acctbal]) AS seg_map
      FROM customer
    )
    SELECT c_custkey,
           profile.seg AS profile_seg,
           profile.bal AS profile_bal,
           list_extract(map_extract(seg_map, 'BUILDING'), 1) AS building_bal,
           CARDINALITY(seg_map) AS map_size
    FROM built
    """,
)
def scalar_struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct and map construction + field/key access, projected back
    to scalars (struct/map CELLS are engine-repr-specific; their
    contents are not)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    built = c.select(
        "c_custkey",
        F.named_struct(
            F.lit("seg"), F.col("c_mktsegment"), F.lit("bal"), F.col("c_acctbal")
        ).alias("profile"),
        F.create_map(F.col("c_mktsegment"), F.col("c_acctbal")).alias("seg_map"),
    )
    return built.select(
        "c_custkey",
        F.col("profile.seg").alias("profile_seg"),
        F.col("profile.bal").alias("profile_bal"),
        F.element_at("seg_map", "BUILDING").alias("building_bal"),
        F.size("seg_map").alias("map_size"),
    )


@query(
    "sequence_generation",
    oracle="""
    SELECT r_regionkey,
           CAST(i AS INTEGER) AS quarter_idx,
           CAST(CAST('1995-01-01' AS DATE) + (CAST(i AS INTEGER) * INTERVAL '3 months') AS DATE)
             AS quarter_start
    FROM region, generate_series(0, 3) AS t(i)
    """,
)
def sequence_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: per-region quarterly date scaffold (sequence +
    explode — the lateral table-function shape used by the gap-filler)."""
    r = load_tables(spark, sf_dir, ("region",))["region"]
    return (
        r.select("r_regionkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("quarter_idx"))
        .select(
            "r_regionkey",
            "quarter_idx",
            F.add_months(F.lit("1995-01-01").cast("date"), F.col("quarter_idx") * 3).alias(
                "quarter_start"
            ),
        )
    )


@query("sampling_repeatable")  # engine-specific PRNG: rows-only; fraction asserted in tests
def sampling_repeatable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling: repeatable within the engine (fixed
    seed), engine-specific across engines (PRNGs differ — no value
    oracle possible by construction)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@query(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, rate_kind, rate
    FROM (SELECT l_orderkey, l_linenumber, l_discount, l_tax
          FROM lineitem WHERE l_orderkey <= 200)
    UNPIVOT (rate FOR rate_kind IN (l_discount, l_tax))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide rate columns to (kind, value) rows — the
    inverse of agg_pivot. Narrow map-side transform, no shuffle.
    NULL handling parity: both engines drop NULL measures (none occur
    in the fixture)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_discount", "l_tax"],
            "rate_kind",
            "rate",
        )
    )


@query(
    "agg_percentile_disc_vs_cont",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_cont,
           quantile_disc(o_totalprice, 0.5) AS median_disc,
           quantile_disc(o_totalprice, 0.9) AS p90_disc
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile_disc_vs_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC vs the interpolating PERCENTILE_CONT: disc
    returns an actual population value (no interpolation — exact,
    engine-invariant), cont interpolates between neighbors (rounded
    4dp for libm parity). Spark == DuckDB on both definitions."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    o.createOrReplaceTempView("pct_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               ROUND(percentile(o_totalprice, 0.5), 4) AS median_cont,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                 AS median_disc,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p90_disc
        FROM pct_orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "scalar_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(CAST(l_quantity - l_quantity AS DOUBLE), 0.0)
             AS div_by_zero,
           TRY_CAST(l_returnflag AS INTEGER) AS bad_cast,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS good_cast
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (ANSI-mode escape hatches): Spark 4
    runs under ANSI SQL where division by zero and bad casts THROW —
    try_divide / try_cast return NULL instead, matching DuckDB's
    TRY_CAST / NULLIF-guarded division. The pattern every ingest
    transform needs for dirty data."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), (F.col("l_quantity") - F.col("l_quantity"))
        ).alias("div_by_zero"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
        F.col("l_quantity").cast("string").try_cast("double").alias("good_cast"),
    )


_SES_ALPHA = 0.3

_SES_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
folded AS (
  SELECT user_id, COUNT(*) AS n_days,
         list_reduce(
           list_prepend(CAST(NULL AS DOUBLE), list(x ORDER BY day)),
           (acc, x) -> CASE WHEN acc IS NULL THEN x
                       ELSE {_SES_ALPHA!r} * x + {1.0 - _SES_ALPHA!r} * acc
                       END
         ) AS ses_forecast
  FROM daily GROUP BY user_id
)
SELECT user_id, n_days, ROUND(ses_forecast, 6) AS ses_forecast FROM folded
"""


@query("timeseries_ses_forecast", oracle=_SES_ORACLE)
def timeseries_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity simple-exponential-smoothing forecast (alpha=0.3)
    over the daily activity series — the one-step-ahead baseline of
    every operational forecasting stack. The recursive smoothing is an
    ORDERED FOLD, which both engines express exactly: Spark
    ``aggregate`` over a date-sorted ``collect_list`` (one user-keyed
    shuffle; the fold is per-row JVM codegen), DuckDB ``list_reduce``
    over ``list(x ORDER BY day)``. Daily sums are decimal-exact and
    every smoothing step is pure IEEE multiply/add on identical
    inputs (NO per-step rounding — rounding each step lands on exact
    .5 ties almost every step, where the engines' tie-breaking
    differs; the raw recursion is bit-identical by IEEE determinism,
    and only the final output is rounded for display).

    100 TB shape: one shuffle keyed on the entity; per-entity state is
    the day series (bounded by the calendar, not the event count —
    the daily pre-aggregation collapses events map-side). For series
    too long to hold as an array, the same fold runs incrementally:
    SES needs only the previous smoothed value, so the persisted-view
    pattern (``matview.py``) carries it batch to batch."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x"))
    )
    series = daily.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("ser"),
    )
    fold = F.aggregate(
        F.col("ser"),
        F.lit(None).cast("double"),
        lambda acc, s: F.when(acc.isNull(), s["x"]).otherwise(
            F.lit(_SES_ALPHA) * s["x"] + F.lit(1.0 - _SES_ALPHA) * acc
        ),
    )
    return series.select("user_id", "n_days", F.round(fold, 6).alias("ses_forecast"))
