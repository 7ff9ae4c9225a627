"""Scalar function surface: string / date / math / conditional /
array / JSON expressions (SURVEY §2.B scalar rows).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Transcendental
results are rounded to 6 decimals in both engines: libm
implementations may differ in the last ulp, and per-row magnitudes
make 1e-6 rounding safely coarse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_tables


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_name, '::', c_mktsegment) AS name_tagged,
           TRIM('  pad  ') AS trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
           STRPOS(c_name, '#') AS hash_pos,
           SPLIT_PART(c_name, '#', 2) AS after_hash
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over customer names.

    Reference parity: the reference's only string ops are the regex
    table-name sanitizer (``pipeline.py:105-106``) — regexp_replace
    here is the same primitive as a column function.
    """
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("::"), F.col("c_mktsegment")).alias("name_tagged"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dy,
           QUARTER(o_orderdate) AS qtr,
           DAYOFWEEK(o_orderdate) + 1 AS dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery over o_orderdate (timestamp fixtures;
    session TZ pinned UTC so both engines agree)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dist,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           POWER(l_quantity, 2) AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery; transcendentals rounded (libm last-ulp variance),
    algebraic ops exact."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           NULLIF(c_nationkey, 0) AS nation_nz,
           CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_int,
           CAST(c_custkey AS VARCHAR) AS key_str,
           CAST(c_acctbal > 0 AS INTEGER) AS is_positive
    FROM customer
    """,
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / casts — the §1.2 type-map
    surface exercised as expressions (the reference did this with SQL
    string surgery at pipeline.py:134-140; here it's typed casts)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_nz"),
        F.col("c_acctbal").cast("bigint").alias("bal_int"),
        F.col("c_custkey").cast("string").alias("key_str"),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           LEN(list_filter(embedding, x -> x > 0)) AS n_positive,
           LEN(embedding[1:8]) AS slice_len
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda surface over the embedding column: size, index,
    fold (F.aggregate), filter, slice. The fold runs left-to-right in
    both engines; rounded since float32 inputs widen per-element."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.size(F.slice("embedding", 1, 8)).alias("slice_len"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key
    FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (JSON-in-string fixture):
    get_json_object + typed from_json struct access."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@query(
    "scalar_explode_posexplode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           ROUND(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE), 6) AS val
    FROM embeddings, generate_series(1, 3) AS t(i)
    """,
)
def scalar_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array rows → (position, value) rows. At scale this
    is a narrow map-side transform — no shuffle."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 3))
    ).select("vec_id", "pos", F.round(F.col("col").cast("double"), 6).alias("val"))
