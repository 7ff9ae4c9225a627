"""Pipeline-surface operators exposed as registry queries so the
driver's differential harness covers them (SURVEY §2.A as queries).

The sha256 anonymize mode is deterministic, so it gets a full value
oracle — DuckDB's sha256() produces the same lowercase hex digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..anonymize import anonymize
from ..ingest import sanitize_table_name
from ..registry import query
from ..tables import load_tables


@query(
    "anonymize_sha256",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS c_name,
           c_mktsegment
    FROM customer
    """,
)
def anonymize_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic anonymization of a sensitive column (reference
    A5, ``pipeline.py:76-84``): chosen column becomes a digest string,
    other columns pass through byte-identical. Join-preserving — equal
    plaintexts map to equal digests, so FK joins still work after
    anonymization (the property the reference loses with per-run
    Fernet keys)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return anonymize(c, ["c_name", "not_a_column"], mode="sha256").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "table_name_sanitization",
    oracle="""
    SELECT * FROM (VALUES
      ('Test-File 2020.csv', 'Test_File_2020'),
      ('My.File.Name.txt',   'My_File_Name'),
      ('2024 report (final).parquet', '2024_report_final_'),
      ('__already_clean',    'already_clean')
    ) AS t(raw_name, table_name)
    """,
)
def table_name_sanitization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 as a query: golden in/out pairs of the sanitizer (the
    reference's own unit fixture, ``tests/test_pipeline.py:42-45``,
    extended). The Spark side applies the real function driver-side to
    the same literals."""
    pairs = [
        ("Test-File 2020.csv",),
        ("My.File.Name.txt",),
        ("2024 report (final).parquet",),
        ("__already_clean",),
    ]
    df = spark.createDataFrame(pairs, ["raw_name"])
    mapping = {raw: sanitize_table_name(raw) for (raw,) in pairs}
    expr = F.col("raw_name")
    mapped = None
    for raw, clean in mapping.items():
        mapped = (
            F.when(expr == raw, clean) if mapped is None else mapped.when(expr == raw, clean)
        )
    return df.withColumn("table_name", mapped)
