"""User-defined function surface (SURVEY §2.B "UDF surface" row):
row-at-a-time Python UDF, Arrow-vectorized pandas UDFs (scalar and
grouped-agg), grouped-map applyInPandas, and a UDTF.

Every closure here is self-contained (stdlib/pandas imports inside) —
executor workers never need this package on sys.path (see the verify
skill's gotcha).

Scale notes: the pandas variants move data via Arrow batches and are
the only Python forms acceptable in a 100 TB hot path; the row-at-a-
time UDF is included for surface completeness and is 10-100x slower
by design — the docstring, not the benchmark, is where it belongs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_tables


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'XL'
                WHEN o_totalprice >= 150000 THEN 'L'
                WHEN o_totalprice >= 50000  THEN 'M'
                ELSE 'S' END AS size_band
    FROM orders
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (surface completeness; the same logic
    belongs in F.when for production — see scalar_conditional_null)."""

    def band(price):
        if price is None:
            return None
        if price >= 300000:
            return "XL"
        if price >= 150000:
            return "L"
        if price >= 50000:
            return "M"
        return "S"

    band_udf = F.udf(band, T.StringType())
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select("o_orderkey", band_udf("o_totalprice").alias("size_band"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice * 1.1 + 5.0, 4) AS adjusted_price
    FROM orders
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: whole columns in, whole
    columns out, one Python call per batch."""

    def adjust(s):
        return (s * 1.1 + 5.0).round(4)

    adjust.__annotations__ = {"s": pd.Series, "return": pd.Series}
    adjust_udf = F.pandas_udf(adjust, "double")
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select("o_orderkey", adjust_udf("o_totalprice").alias("adjusted_price"))


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS status_revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: one Series in, one scalar out per
    group. Sums through Decimal so the result is engine-exact like the
    built-in decimal path."""

    def dec_sum(s):
        from decimal import Decimal

        total = sum((Decimal(str(round(v, 2))) for v in s), Decimal(0))
        return float(total)

    dec_sum.__annotations__ = {"s": pd.Series, "return": float}
    agg_udf = F.pandas_udf(dec_sum, "double")
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderstatus").agg(agg_udf("o_totalprice").alias("status_revenue"))


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ROUND(CAST(c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey) AS DOUBLE), 4)
             AS bal_centered
    FROM customer
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group pandas DataFrame in/out
    (per-nation balance centering). The oracle expresses the same
    semantics as a window AVG; n per group is small enough that the
    pandas mean is exact to well past the 4dp rounding."""

    def center(pdf):
        out = pdf[["c_nationkey", "c_custkey"]].copy()
        out["bal_centered"] = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()).round(4)
        return out

    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_nationkey").applyInPandas(
        center, "c_nationkey int, c_custkey long, bal_centered double"
    )


@query(
    "udtf_split_orders",
    oracle="""
    SELECT o_orderkey, part_no,
           CAST(ROUND(o_totalprice / 3.0, 2) AS DOUBLE) AS installment
    FROM orders, generate_series(1, 3) AS t(part_no)
    """,
)
def udtf_split_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued function surface: one input row -> three
    installment rows. Declared with the built-in lateral explode
    (Spark's UDTF decorator targets the same plan shape; the built-in
    generator keeps it JVM-side)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("part_no"),
        F.round(F.col("o_totalprice") / 3.0, 2).alias("installment"),
    ).select("o_orderkey", F.col("part_no").cast("long").alias("part_no"), "installment")


@query(
    "udtf_python_split_words",
    oracle="""
    SELECT doc_id, w AS word, LENGTH(w) AS word_len
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents WHERE doc_id < 20) t
    """,
)
def udtf_python_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (@udtf class, Spark 3.5+): one text row in,
    one row per word out, invoked via LATERAL join in SQL. The class
    is defined inside this function so cloudpickle ships it by value
    (executor workers don't import this package). Oracle: the
    equivalent unnest. For production word-splitting use the built-in
    explode(split()) — this exists to cover the UDTF extension
    surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, word_len: int")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w, len(w))

    spark.udtf.register("dws_split_words", SplitWords)
    from ..tables import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.word_len
        FROM documents d, LATERAL dws_split_words(d.text) s
        WHERE d.doc_id < 20
        """
    )
