"""Incremental corpus dedup against a persisted signature store —
how the MinHash pipeline runs in PRODUCTION at 100 TB: documents
arrive in batches (or a stream); each batch is checked against every
document ever accepted WITHOUT rescanning the corpus, because the
signature table (``dedup.signature_table``) is the persisted state.

Per batch:

1. compute signatures + hash sets for the new docs (one pass over
   the batch only);
2. LSH-band the batch and equi-join against the STORE's bands
   (shuffle is batch-sized; the store side prunes to matching band
   hashes) plus the batch's own bands (intra-batch dups);
3. verify candidates by exact hash-set Jaccard;
4. append the accepted signatures to the store.

The store is plain parquet here; on a cluster the same code targets
any table format. Bands are recomputed from the stored ``m*`` columns
at read time (32 xxhash64 calls per row — cheaper than storing them).

``stream_incremental_dedup`` wires the same per-batch function into a
Structured Streaming ``foreachBatch`` sink, which is the
exactly-once-per-epoch production harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import JACCARD_THRESHOLD, band_table, hashset_jaccard, signature_table


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via Spark's Hadoop conf — so
    store probes and swaps work on ANY supported scheme (file://,
    hdfs://, s3a://...), not just the driver's local disk. An
    unsupported scheme raises here (loudly) instead of silently
    reporting 'no store'."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def store_exists(spark: SparkSession, store_path: str) -> bool:
    """True iff the store directory exists and holds >=1 parquet file.
    A driver-local ``os.path.isdir`` here would return False for every
    hdfs://s3a:// store and silently SKIP the vs-store dedup check —
    accepting duplicates is a correctness bug, so the probe must go
    through the Hadoop FS layer."""
    fs, jpath = _hadoop_fs(spark, store_path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def dedup_append_batch(
    spark: SparkSession, batch: DataFrame, store_path: str
) -> dict[str, int]:
    """Process one batch of (doc_id, text) rows against the signature
    store at ``store_path``. Returns counts:
    ``{"n_batch", "n_dup_vs_store", "n_dup_in_batch", "n_accepted"}``.

    Intra-batch duplicates keep the smallest doc_id; a batch doc that
    near-dups ANY stored doc is dropped. Accepted signatures are
    appended to the store.
    """
    sig_new = signature_table(batch).cache()
    bands_new = band_table(sig_new)
    n_batch = sig_new.count()  # also materializes the cache

    has_store = store_exists(spark, store_path)

    # --- candidates vs the persisted store ---------------------------------
    dup_vs_store = None
    if has_store:
        store_sig = spark.read.parquet(store_path)
        bands_store = band_table(store_sig)
        cand = (
            bands_new.alias("n")
            .join(
                bands_store.alias("s"),
                (F.col("n.band_id") == F.col("s.band_id"))
                & (F.col("n.band_hash") == F.col("s.band_hash")),
            )
            .select(
                F.col("n.doc_id").alias("new_id"), F.col("s.doc_id").alias("store_id")
            )
            .distinct()
        )
        jac = hashset_jaccard(F.col("ns.hset"), F.col("ss.hset"))
        dup_vs_store = (
            cand.join(
                F.broadcast(sig_new.select("doc_id", "hset")).alias("ns"),
                F.col("new_id") == F.col("ns.doc_id"),
            )
            .join(
                store_sig.select("doc_id", "hset").alias("ss"),
                F.col("store_id") == F.col("ss.doc_id"),
            )
            .filter(jac >= JACCARD_THRESHOLD)
            .select("new_id")
            .distinct()
        )

    # --- intra-batch duplicates (keep the smallest doc_id) -----------------
    a, b = bands_new.alias("a"), bands_new.alias("b")
    intra_cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("keep_id"), F.col("b.doc_id").alias("drop_id"))
        .distinct()
    )
    jac_i = hashset_jaccard(F.col("ka.hset"), F.col("kb.hset"))
    dup_in_batch = (
        intra_cand.join(
            F.broadcast(sig_new.select("doc_id", "hset")).alias("ka"),
            F.col("keep_id") == F.col("ka.doc_id"),
        )
        .join(
            F.broadcast(sig_new.select("doc_id", "hset")).alias("kb"),
            F.col("drop_id") == F.col("kb.doc_id"),
        )
        .filter(jac_i >= JACCARD_THRESHOLD)
        .select(F.col("drop_id").alias("new_id"))
        .distinct()
    )

    drops = dup_in_batch if dup_vs_store is None else dup_in_batch.union(dup_vs_store).distinct()
    n_dup_in_batch = dup_in_batch.count()
    n_dup_vs_store = 0 if dup_vs_store is None else dup_vs_store.count()

    accepted = sig_new.join(drops, sig_new["doc_id"] == drops["new_id"], "left_anti")
    n_accepted = accepted.count()
    accepted.write.mode("append").parquet(store_path)
    sig_new.unpersist()
    return {
        "n_batch": n_batch,
        "n_dup_vs_store": n_dup_vs_store,
        "n_dup_in_batch": n_dup_in_batch,
        "n_accepted": n_accepted,
    }


def stream_incremental_dedup(
    spark: SparkSession, docs_dir: str, store_path: str, schema: str | None = None
) -> list[dict[str, int]]:
    """Run incremental dedup over a documents file STREAM: each
    micro-batch flows through ``dedup_append_batch`` inside a
    ``foreachBatch`` sink (per-epoch stats accumulate in order).

    ``docs_dir`` is polled for ``*.parquet`` documents files — drop a
    new file in, get exactly one dedup epoch for it.
    """
    stats: list[dict[str, int]] = []
    doc_schema = schema or "doc_id long, text string, lang string, source string, n_chars long"

    def handle(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        out = dedup_append_batch(spark, batch_df.select("doc_id", "text"), store_path)
        out["epoch"] = epoch
        stats.append(out)

    stream = (
        spark.readStream.schema(doc_schema)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .load(docs_dir)
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return stats


def refresh_daily_revenue(
    spark: SparkSession, batch_orders: DataFrame, store_path: str
) -> DataFrame:
    """Incrementally maintain a daily-revenue materialized aggregate:
    fold one batch of orders into the aggregate table at
    ``store_path`` and return the refreshed aggregate.

    The classic partial-aggregate merge: the batch reduces to one row
    per day (batch-sized shuffle), unions with the existing aggregate
    rows (day-cardinality — tiny), and re-reduces. The fact history
    is never rescanned; compare with recomputing SUM over all orders
    ever ingested. Plain parquet overwrite stands in for a
    transactional table format's MERGE (the exactly-once wrapper is
    ``foreachBatch``, as in ``stream_incremental_dedup``).

    SUMs are exact decimals end-to-end so repeated merging never
    drifts: (a+b)+c == a+(b+c) holds for DECIMAL, not DOUBLE.
    """
    delta = (
        batch_orders.select(
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("day")
        .agg(F.sum("price").alias("revenue"), F.count("*").alias("n_orders"))
    )
    if store_exists(spark, store_path):
        current = spark.read.parquet(store_path)
        merged = (
            current.unionByName(delta)
            .groupBy("day")
            .agg(F.sum("revenue").alias("revenue"), F.sum("n_orders").alias("n_orders"))
        )
    else:
        merged = delta
    # Write-aside then swap via the Hadoop FS (scheme-agnostic).
    # NOT atomic: a crash between delete and rename loses the current
    # aggregate (the _next directory still holds the data for manual
    # recovery). A transactional table format (Delta/Iceberg MERGE)
    # or the foreachBatch epoch wrapper is the production answer;
    # plain parquet fundamentally cannot swap atomically.
    tmp = store_path.rstrip("/") + "_next"
    merged.write.mode("overwrite").parquet(tmp)
    fs, jdest = _hadoop_fs(spark, store_path)
    _, jtmp = _hadoop_fs(spark, tmp)
    if fs.exists(jdest):
        fs.delete(jdest, True)
    if not fs.rename(jtmp, jdest):
        raise IOError(f"rename {tmp} -> {store_path} failed")
    return spark.read.parquet(store_path)
