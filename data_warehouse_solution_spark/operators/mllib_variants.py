"""MLlib-based variants of the near-dup / similarity / text-feature
operators (SURVEY §2.C maps these to ``pyspark.ml.feature``): the
library counterparts of the hand-built column-expression versions in
``dedup.py`` / ``similarity.py`` / ``textops.py``.

Both implementations ship on purpose: the custom versions are
oracle-checkable (engine-invariant hashes) and tuned for the fixture;
the MLlib versions are the batteries-included path with fitted models,
approxSimilarityJoin, and pipeline composability. Tests cross-check
them against each other (MLlib hash seeds are engine-specific, so no
DuckDB oracle by construction — rows-only in the registry).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    HashingTF,
    IDF,
    MinHashLSH,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, spread
from .dedup import _shingles

N_FEATURES = 1 << 16


def _shingle_vectors(df: DataFrame) -> DataFrame:
    """documents -> sparse binary shingle vectors for MinHashLSH
    (hashing-trick indexed word 5-grams). Docs shorter than the
    shingle width produce no shingles and are dropped — MinHashLSH
    rejects all-zero vectors, and a <5-word doc can't share a 5-gram
    with anything anyway."""
    with_shingles = df.select("doc_id", _shingles().alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=N_FEATURES, binary=True)
    return tf.transform(with_shingles)


@query("dedup_minhash_mllib")  # MLlib hash seeds: rows-only; cross-checked vs custom impl in tests
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH via pyspark.ml: fit the hash model, then
    approxSimilarityJoin at Jaccard distance <= 0.5 — the library
    counterpart of dedup_minhash_lsh. Output: candidate pairs with
    the model's Jaccard distance."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    vecs = _shingle_vectors(d)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query("text_tfidf_mllib")  # hashing-trick indices: rows-only; properties tested
def text_tfidf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer -> StopWordsRemover -> HashingTF -> IDF pipeline
    (the classic ml.feature text featurization), summarized per doc
    as the number of active features and the max TF-IDF weight."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    tokens = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern=r"\s+"
    ).transform(d)
    filtered = StopWordsRemover(inputCol="tokens", outputCol="filtered").transform(tokens)
    tf = HashingTF(
        inputCol="filtered", outputCol="tf", numFeatures=N_FEATURES
    ).transform(filtered)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = idf_model.transform(tf)

    def summarize(v):
        vals = v.toArray()
        nz = vals[vals > 0]
        return (int(len(nz)), float(nz.max()) if len(nz) else 0.0)

    from pyspark.sql import types as T

    summarize_udf = F.udf(
        summarize,
        T.StructType(
            [
                T.StructField("n_active", T.IntegerType()),
                T.StructField("max_weight", T.DoubleType()),
            ]
        ),
    )
    return out.select(
        "doc_id", summarize_udf("tfidf").alias("s")
    ).select("doc_id", F.col("s.n_active").alias("n_active"), F.round(F.col("s.max_weight"), 4).alias("max_tfidf"))
