"""Catalog of the driver-generated test tables and view registration.

Tables (TPC-H-ish star schema + events/documents/embeddings; see
/root/repo/FIXTURES.md) live as one parquet file per table under a
scale-factor directory. Parquet scans get predicate pushdown and
column pruning from Catalyst for free — the reference's manual
1000-row chunking (``pipeline.py:205``) is replaced by partitioned
columnar scans sized by ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these
# are bounded by the schema (5 regions, 25 nations) or grow sub-linearly.
# At 100 TB the fact tables shuffle; these never should.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts has shipped as parquet TIMESTAMP(NANOS) in earlier
    testdata generations (Spark's reader only accepts that as a raw
    long under the legacy conf; floor to microseconds — the same
    truncation DuckDB applies presenting TIMESTAMP_NS) and as
    TIMESTAMP(MICROS) in current ones (reads natively as
    TIMESTAMP_NTZ; cast to the session TIMESTAMP, which under the
    pinned UTC zone is value-identical to the nanos path). Handle
    both so the engine is robust to either fixture vintage."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the requested tables as DataFrames keyed by name.

    Defensively pins the session timezone to UTC: every timestamp
    fixture is UTC-naive and the DuckDB oracle compares in UTC, so a
    caller session in another zone would silently shift all
    timestamp-derived values (FIXTURES.md §4).
    """
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        out[name] = _read_events(spark, path) if name == "events" else spark.read.parquet(path)
    return out


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to engine parallelism.

    Small single-file inputs arrive as ONE partition, serializing any
    compute-heavy per-row work (shingling, hashing, UDF batches) onto
    one core. A round-robin shuffle of the raw rows is cheap relative
    to that compute and restores full parallelism. On a real cluster
    with many input splits this is a near-no-op (partition count
    already ≥ parallelism ⇒ skipped)."""
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries can
    name them exactly as the DuckDB oracle does."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
