"""Product-quantization ANN over the embeddings table (north-star
similarity-search surface, BASELINE.json; the reference has no vector
search — its query surface is the SQL verb whitelist at
``pipeline.py:110-114`` in /root/reference).

PQ is the memory-side ANN lever that LSH (``similarity.py``) and IVF
(``kmeans.py``) don't give: the corpus is compressed from 64 float32
dims (256 B) to M=4 uint8 codes (4 B) by quantizing each 16-dim
subspace against its own 16-centroid codebook, and queries score
against the *codes* via asymmetric distance computation (ADC) — the
query stays exact, each code is looked up in a per-subspace distance
table. FAISS's IVFPQ is this plus the IVF coarse partitioner already
implemented in ``similarity.py``/``kmeans.py``.

Scale notes (100 TB): codebooks are M×K×(dim/M) doubles = 4 KiB here,
64 KiB at production sizes — always broadcastable; training samples
the corpus (Lloyd's on a bounded sample, the standard practice) so
driver state stays O(codebook), never O(corpus). Encoding is a
zero-shuffle narrow map of pure column expressions (argmin over K
literal centroids, whole-stage codegen). Scoring broadcasts the query
set against the coded corpus — the same documented re-ranker shape as
brute-force cosine, but moving 4-byte codes instead of 256-byte
vectors, which is the entire point: the scan side shrinks 64×, and at
cluster scale the IVF partitioner bounds how much of it each query
touches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from .kmeans import train_kmeans
from .similarity import N_QUERIES, TOP_K

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace codebook
_DIM = 64  # fixture embedding dimension (FIXTURES.md)
_SUB = _DIM // PQ_M
SHORTLIST = 50  # ADC candidates kept per query for exact re-rank


def _sub_slice(emb: Column, m: int) -> Column:
    return F.slice(emb, m * _SUB + 1, _SUB)


def _sq_dist_lit(vec: Column, cent: list[float]) -> Column:
    """Squared L2 distance between an array column and a literal
    centroid, accumulated left-to-right in double."""
    c = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_code(vec: Column, codebook: list[list[float]]) -> Column:
    """Index (0-based) of the nearest codebook centroid — a pure
    column expression (ties break to the lowest code, matching
    ``kmeans.assign_clusters``)."""
    dists = F.array(*[_sq_dist_lit(vec, c) for c in codebook])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def train_pq_codebooks(
    spark: SparkSession, vectors: DataFrame, sample_limit: int = 100_000
) -> list[list[list[float]]]:
    """One Lloyd's run per subspace on a bounded sample. Driver holds
    only the M×K×SUB codebook (O(KiB))."""
    sample = vectors.select("vec_id", "embedding").limit(sample_limit)
    books = []
    for m in range(PQ_M):
        sub = sample.select(
            "vec_id", _sub_slice(F.col("embedding"), m).alias("embedding")
        )
        cents, _ = train_kmeans(spark, sub, k=PQ_K, max_iters=5)
        books.append(cents)
    return books


def pq_encode(vectors: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, embedding, …) -> (…, code_0..code_{M-1}): the
    zero-shuffle narrow encode."""
    cols = [
        _argmin_code(_sub_slice(F.col("embedding"), m), books[m]).alias(f"code_{m}")
        for m in range(PQ_M)
    ]
    return vectors.select("*", *cols)


@query("ann_pq_topk")  # kmeans-trained codebooks: engine-specific; rows-only + recall column
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k by L2, FAISS-style two stage: ADC over
    the coded corpus produces a SHORTLIST of candidates per query (the
    cheap stage — it scans 8-byte codes, not 256-byte vectors), then
    only the shortlist is re-ranked with exact L2 on the full vectors
    (the expensive stage, bounded at SHORTLIST rows per query). Emits
    a measured ``recall_at_k`` column against the exact-L2 brute-force
    top-k (computed on the same broadcast shape) so the driver's
    rows-only check captures search quality numerically."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    books = train_pq_codebooks(spark, e.filter(F.col("vec_id") >= N_QUERIES))
    base = pq_encode(
        e.filter(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("n_id"), "embedding", "label"
        ),
        books,
    ).drop("embedding")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # ADC: distance table lookup per subspace, summed. The codebook is
    # a literal expression, so the lookup is element_at over a 16-wide
    # literal array of precomputed query-subspace-to-centroid columns.
    adc = None
    for m in range(PQ_M):
        table = F.array(
            *[_sq_dist_lit(_sub_slice(F.col("q_emb"), m), c) for c in books[m]]
        )
        term = F.element_at(table, F.col(f"code_{m}") + 1)
        adc = term if adc is None else adc + term
    scored = base.crossJoin(F.broadcast(queries)).select(
        "q_id", "n_id", "label", F.round(adc, 6).alias("adc_dist")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("n_id"))
    shortlist = (
        scored.withColumn("rnk_adc", F.row_number().over(w))
        .filter(F.col("rnk_adc") <= SHORTLIST)
        .select("q_id", "n_id", "label", "adc_dist")
    )
    # exact re-rank: fetch ONLY the shortlisted vectors (keyed join on
    # n_id — at corpus scale this touches SHORTLIST×|queries| rows,
    # not the corpus) and rank by true L2.
    exact_d2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("n_emb"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    candidates = shortlist.join(
        e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")),
        "n_id",
    ).join(F.broadcast(queries), "q_id")
    wr = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("n_id"))
    pq_topk = (
        candidates.select(
            "q_id", "n_id", "label", "adc_dist", F.round(exact_d2, 6).alias("d2")
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "label", "adc_dist", "d2", "rnk")
    )
    # exact-L2 ground truth on the same broadcast shape (documented
    # re-ranker; at corpus scale recall is measured on a sample)
    exact = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
        .crossJoin(F.broadcast(queries))
        .select(
            "q_id",
            "n_id",
            F.aggregate(
                F.zip_with(
                    F.col("q_emb"),
                    F.col("n_emb"),
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    we = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("n_id"))
    true_topk = (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id")
    )
    recall = (
        true_topk.join(pq_topk.select("q_id", "n_id"), ["q_id", "n_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.round(F.count("*") / F.lit(TOP_K), 4).alias("recall_at_k"))
    )
    return pq_topk.join(recall, "q_id", "left").na.fill({"recall_at_k": 0.0})
