"""Physical data layout utilities for scale: bucketed tables
(shuffle-free co-located joins), date-partitioned writes (partition
pruning), salted joins (skew mitigation), and small-file compaction.

These are the levers that decide whether a plan that works at sf0.1
still works at 100 TB: a fact-fact join that buckets both sides on
the join key skips its shuffle entirely; a date-partitioned table
prunes scans to the queried range; a salted join splits a hot key
across workers instead of melting one; compaction keeps file counts
(and thus task counts and metadata pressure) bounded.

Tests assert the *plans*: no Exchange under a bucketed join,
PartitionFilters present under a pruned scan, and salted-join results
exactly equal to the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 8
) -> None:
    """Persist as a bucketed (+sorted) managed table: later equi-joins
    and aggregations on the bucket columns read co-located data and
    skip the shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, max_records_per_file: int = 1_000_000
) -> None:
    """Write parquet partitioned by the date of ``ts_col`` with a
    bounded per-file record count — the standard time-series layout
    (partition pruning on date predicates; file sizes controlled so
    a 100 TB table doesn't become a million tiny files)."""
    (
        df.withColumn("_dt", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("_dt")
        .parquet(path)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the left (skewed) side gets a
    random salt in [0, n_salts); the right side is replicated once per
    salt value. The hot key's rows then spread across n_salts
    partitions instead of one. Results are exactly those of the plain
    join — only the partitioning changes.

    Use when one side has a pathological hot key and AQE's skew-join
    splitting isn't available/enough. The replication multiplies the
    right side by n_salts — keep it the smaller input.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    salted_left = left.withColumn("_salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_right = right.select("*", salts)
    cond: Column = (salted_left[left_key] == salted_right[right_key]) & (
        salted_left["_salt"] == salted_right["_salt"]
    )
    return salted_left.join(salted_right, cond, how).drop("_salt")


def compact(
    spark: SparkSession, src_path: str, dest_path: str, target_partitions: int | None = None
) -> int:
    """Rewrite a parquet directory into ``target_partitions`` files at
    ``dest_path`` (write-aside; the caller swaps directories when the
    new copy is verified — never overwrite a dataset while reading
    it). Returns the file count written. The maintenance pass that
    keeps long-lived tables scan-efficient."""
    df = spark.read.parquet(src_path)
    n = target_partitions or spark.sparkContext.defaultParallelism
    df.repartition(n).write.mode("overwrite").parquet(dest_path)
    return n
