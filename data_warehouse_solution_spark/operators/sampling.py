"""Training-mix construction operators: deterministic stratified
sampling and token-budget sequence packing over the documents table —
the two steps between "curated corpus" and "training batches" in an
LLM data pipeline (north-star extension surface, BASELINE.json; the
reference has no sampling at all — its only selection is the SQL verb
whitelist, ``pipeline.py:110-114`` in /root/reference).

Scale notes (100 TB): both operators are narrow maps plus at most one
keyed shuffle. The sampler's keep/drop decision is a pure hash
expression evaluated inside whole-stage codegen — no RNG state, no
driver coordination, and (unlike ``df.sample``) stable under retries,
repartitioning, AND incremental re-runs: a document's fate depends
only on its id, so yesterday's sample never churns when today's files
arrive. Packing shuffles once on the stratum key; bin assignment is a
running sum inside the partition — the streaming-friendly
approximation of bin packing (each doc goes to the currently-open
bin; no backtracking), which is the standard practice for context-
window packing at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import maybe_broadcast
from ..registry import query
from ..tables import load_tables, spread

# per-stratum keep rates, expressed as a 4-hex-digit threshold over the
# first 16 bits of md5(doc_id): lexicographic compare of lowercase hex
# == numeric compare, and md5 agrees byte-for-byte across engines.
# source number % 4 -> threshold: 25%, 45%, 65%, 85%.
_RATE_THRESHOLDS = ("4000", "7333", "a666", "d999")

_SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 4
           WHEN 0 THEN '{_RATE_THRESHOLDS[0]}'
           WHEN 1 THEN '{_RATE_THRESHOLDS[1]}'
           WHEN 2 THEN '{_RATE_THRESHOLDS[2]}'
           ELSE '{_RATE_THRESHOLDS[3]}' END
"""


@query("sample_stratified_deterministic", oracle=_SAMPLE_ORACLE)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sampling by content-stable hash: keep a doc
    iff the first 16 bits of md5(doc_id) fall under its stratum's
    threshold. Gives each source a different mixing weight (the
    'data mixture' knob) with zero RNG — fully deterministic, exactly
    reproducible on any engine, and incrementally stable (appending
    new files never changes old keep/drop decisions, unlike
    fraction-based df.sample whose output depends on partition
    layout). The predicate is a codegen'd column expression that
    pushes nothing to Python."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    src_num = F.regexp_extract("source", r"([0-9]+)$", 1).cast("int") % 4
    threshold = (
        F.when(src_num == 0, _RATE_THRESHOLDS[0])
        .when(src_num == 1, _RATE_THRESHOLDS[1])
        .when(src_num == 2, _RATE_THRESHOLDS[2])
        .otherwise(_RATE_THRESHOLDS[3])
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < threshold
    return d.filter(keep).select("doc_id", "source", "lang")


# tokens per context-window bin. Small relative to real context sizes
# because the fixture docs are short (~60 tokens): 256 yields several
# bins per stratum even at sf0.01, so the bin-crossing logic is
# actually exercised by the correctness gate, not just the degenerate
# single-bin case.
_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
           AS tok_offset
  FROM toks
)
SELECT source,
       CAST(floor(tok_offset / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY source, CAST(floor(tok_offset / {_PACK_BUDGET}.0) AS BIGINT)
"""


@query("pack_sequences_by_token_budget", oracle=_PACK_ORACLE)
def pack_sequences_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing: within each source stratum,
    docs (in stable doc_id order) are appended to the currently-open
    bin; a doc whose cumulative offset crosses the token budget opens
    the next bin. One shuffle on the stratum key; the bin id is a
    running-sum window — the linear-time streaming form of bin
    packing used for training-batch construction (exact bin packing
    is NP-hard and needs global state; this is the industry-standard
    greedy approximation)."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = toks.withColumn(
        "tok_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    )
    bin_id = F.floor(F.col("tok_offset") / _PACK_BUDGET).cast("bigint")
    return (
        cum.groupBy("source", bin_id.alias("bin_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# shard count for the deterministic corpus shuffle. Tiny here so every
# shard is exercised at sf0.01; at 100 TB this is deployment config
# (~10k shards so each shard's sort fits one task comfortably).
_N_SHARDS = 8

# the shard id mixes the first two hex chars of the md5 key via their
# ASCII codes — not perfectly uniform, but deterministic and expressible
# identically in both engines (hex->int differs between Spark's conv()
# and DuckDB); production uses xxhash64(key) % shards.
_SHARD_EXPR = (
    "(ascii(substr(shuffle_key,1,1))*16 + ascii(substr(shuffle_key,2,1))) % "
    f"{_N_SHARDS}"
)

_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       CAST({_SHARD_EXPR} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {_SHARD_EXPR}
            ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
FROM h
"""


@query("corpus_shuffle_shards", oracle=_SHUFFLE_ORACLE)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: each document gets a
    content-stable shuffle key (md5 of a seeded id), a shard, and a
    position within its shard — the (shard, pos) order is the training
    read order. Seeded-hash ordering is how corpus-scale shuffles are
    done in practice: no RNG state, reproducible across engines and
    re-runs, and the sort is per-shard (one keyed shuffle, each task
    sorts only its shard) rather than a single global total order."""
    from pyspark.sql import Window

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    key = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", key.alias("shuffle_key"))
    shard = (
        (
            F.ascii(F.substring("shuffle_key", 1, 1)) * 16
            + F.ascii(F.substring("shuffle_key", 2, 1))
        )
        % _N_SHARDS
    ).cast("int")
    sharded = keyed.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return sharded.withColumn("pos", F.row_number().over(w).cast("bigint"))


# train/val/test boundaries over the first 16 bits of the split hash:
# 80% / 10% / 10%
_SPLIT_TRAIN, _SPLIT_VAL = "cccc", "e666"

_SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_SPLIT_TRAIN}' THEN 'train'
            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_SPLIT_VAL}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@query("split_train_val_test", oracle=_SPLIT_ORACLE)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-
    stable hash: a document's split depends only on its id, so the
    assignment is reproducible across engines and re-runs, and
    appending new data never moves an old document across splits (the
    leakage mode of fraction-based random splitting under re-runs).
    Same md5-threshold idiom as the stratified sampler; pure codegen'd
    expression, no shuffle."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4
    )
    split = (
        F.when(h < _SPLIT_TRAIN, "train")
        .when(h < _SPLIT_VAL, "val")
        .otherwise("test")
    )
    return d.select("doc_id", "source", split.alias("split"))


# temperature-mix scaling constant: target tokens per source =
# floor(_MIX_C * sqrt(source_tokens)) — the unnormalized form of
# p_s ∝ T_s^0.5 temperature sampling. Closed-form per source (no
# cross-source float normalization) so both engines compute the
# identical IEEE double and the floor can never flip on a ulp.
_MIX_C = 20.0

_MIX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
st AS (SELECT source, SUM(n_tokens) AS t FROM tok GROUP BY source),
q AS (SELECT source,
             CAST(FLOOR({_MIX_C} * SQRT(t)) AS BIGINT) AS quota
      FROM st),
c AS (SELECT tok.*,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM tok)
SELECT doc_id, source, n_tokens, cum_tokens, quota
FROM c JOIN q USING (source)
WHERE cum_tokens <= quota
"""


@query("mix_temperature_resample", oracle=_MIX_ORACLE)
def mix_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the data-mixture rebalancing
    step of an LLM pipeline): each source's token quota grows as
    T^0.5, so small sources are up-weighted relative to their natural
    share — the alpha<1 sampling used to keep low-resource slices
    alive. Docs are admitted in content-stable md5(doc_id) order until
    the running token total passes the quota, making the selection
    deterministic, engine-reproducible, and incrementally stable.

    Scale (100 TB): one narrow map for token counts, one tiny
    per-source aggregate (sources number in the thousands at most —
    broadcast back), and one window cumsum partitioned by source.
    Skewed giant sources make that window's partition hot; the
    production lever is sub-sharding the source key by hash prefix and
    giving each shard a proportional sub-quota — same plan shape.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    tok = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    quota = (
        tok.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .select(
            "source",
            F.floor(F.lit(_MIX_C) * F.sqrt("t")).cast("bigint").alias("quota"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = tok.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
    return (
        c.join(maybe_broadcast(quota), "source")
        .filter(F.col("cum_tokens") <= F.col("quota"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "quota")
    )
