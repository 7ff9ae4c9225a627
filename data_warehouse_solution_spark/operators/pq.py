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
NPROBE = 2  # IVF clusters probed per query in the IVFPQ composition
IVF_CELLS = 10  # coarse cells (fixture: ~50 vectors/cell at sf0.01)


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


def residualize(
    vectors: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, embedding = x - nearest
    centroid): the residual-space view PQ codebooks train on under
    ``by_residual`` (r13). Narrow vectorized map, no shuffle."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)

    def res(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = pdf[["vec_id", "embedding"]].copy()
            if len(pdf) == 0:
                yield out
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            out["embedding"] = list(x - cents[d.argmin(1)])
            yield out

    return vectors.select("vec_id", "embedding").mapInPandas(
        res, "vec_id long, embedding array<double>"
    )


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


# Trained quantizer memo, keyed by fixture dir: training is
# deterministic (seeded init, fixed iteration counts) so re-deriving
# it per query invocation only repeats identical Lloyd's jobs — the
# bench and the test suite both construct these queries repeatedly.
# Driver state is O(KiB) (codebooks + k centroids), parameter-sized,
# never corpus-sized. A changed fixture under the same path would
# need a process restart — acceptable for read-only testdata.
_TRAINED: dict[tuple[str, str], object] = {}


def _trained_books(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame | None = None,
    cache_key: str = "",
    residual_centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    key = ("books", sf_dir + cache_key)
    if key not in _TRAINED:
        e = (
            vectors
            if vectors is not None
            else load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        )
        corpus = e.filter(F.col("vec_id") >= N_QUERIES)
        if residual_centroids is not None:
            corpus = residualize(corpus, residual_centroids)
        _TRAINED[key] = train_pq_codebooks(spark, corpus)
    return _TRAINED[key]  # type: ignore[return-value]


def _trained_coarse(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame | None = None,
    cache_key: str = "",
) -> list[list[float]]:
    key = ("coarse", sf_dir + cache_key)
    if key not in _TRAINED:
        e = (
            vectors
            if vectors is not None
            else load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        )
        centroids, _ = train_kmeans(
            spark,
            e.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "embedding"),
            k=IVF_CELLS,
            max_iters=10,
        )
        _TRAINED[key] = centroids
    return _TRAINED[key]  # type: ignore[return-value]


def pq_encode(
    vectors: DataFrame,
    books: list[list[list[float]]],
    cell_centroids: list[list[float]] | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """(vec_id, embedding, …) -> (…, code_0..code_{M-1}[, cl]): the
    zero-shuffle narrow encode, vectorized.

    One Arrow batch at a time, each subspace's code is a numpy
    ``argmin`` over the (n, K) distance matrix — the previous
    literal-expression form evaluated 128 interpreted higher-order
    functions per row (measured 3.5 s for 5k rows at sf0.1 vs ~0.1 s
    vectorized; HOFs never enter whole-stage codegen). ``argmin``
    returns the FIRST minimum, matching the old
    array_position(array_min) tie-break. With ``cell_centroids`` the
    same pass also emits the IVF cell id ``cl`` (nearest centroid,
    first-min tie-break = kmeans.assign_clusters' least(struct)).

    ``by_residual`` (r13) codes the RESIDUAL ``x - centroid[cl]``
    instead of the raw vector — FAISS IVFPQ's default design: the
    coarse quantizer absorbs the between-cell offset so all code bits
    spend on WITHIN-cell geometry, which is what keeps ADC ranking
    informative on clustered corpora (raw-vector codes collapse to
    one code word per cell there). Requires ``cell_centroids``."""
    if by_residual and cell_centroids is None:
        raise ValueError("by_residual requires cell_centroids")
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in vectors.schema.fields
    )
    out_ddl += ", " + ", ".join(f"code_{m} int" for m in range(PQ_M))
    if cell_centroids is not None:
        out_ddl += ", cl int"

    import numpy as np

    books_arr = np.asarray(books, dtype=np.float64)  # (M, K, SUB)
    cells_arr = (
        None if cell_centroids is None else np.asarray(cell_centroids, dtype=np.float64)
    )
    n_sub, sub_dim = PQ_M, _SUB

    def enc(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                for m in range(n_sub):
                    out[f"code_{m}"] = pd.Series([], dtype="int32")
                if cells_arr is not None:
                    out["cl"] = pd.Series([], dtype="int32")
                yield out
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cl = None
            if cells_arr is not None:
                dc = ((x[:, None, :] - cells_arr[None, :, :]) ** 2).sum(-1)
                cl = dc.argmin(1).astype("int32")
                out["cl"] = cl
            coded = x - cells_arr[cl] if by_residual else x
            for m in range(n_sub):
                sub = coded[:, m * sub_dim : (m + 1) * sub_dim]
                d = ((sub[:, None, :] - books_arr[m][None, :, :]) ** 2).sum(-1)
                out[f"code_{m}"] = d.argmin(1).astype("int32")
            yield out

    return vectors.mapInPandas(enc, out_ddl)


def _with_adc_tables(
    queries: DataFrame,
    books: list[list[list[float]]],
    cells: list[list[float]] | None = None,
) -> DataFrame:
    """Append the per-subspace ADC distance tables (adc_t0..adc_t7,
    each a K-wide array of squared distances from the query's
    sub-vector to the codebook centroids) to a (q_id, q_emb, ...)
    frame — numpy-vectorized per Arrow batch, computed once per QUERY
    row before any corpus join (the per-scored-row literal-expression
    form was the ADC hot spot: 128 interpreted HOFs per row).

    With ``cells`` (r13, by_residual): the frame must carry a
    ``probe_cl`` column and the tables are computed on the RESIDUAL
    ``q_emb - cells[probe_cl]`` — one table set per (query, probed
    cell), matching residual-coded corpus vectors."""
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in queries.schema.fields
    )
    out_ddl += ", " + ", ".join(f"adc_t{m} array<double>" for m in range(PQ_M))

    import numpy as np

    books_arr = np.asarray(books, dtype=np.float64)
    cells_arr = None if cells is None else np.asarray(cells, dtype=np.float64)
    n_sub, sub_dim = PQ_M, _SUB

    def tab(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                for m in range(n_sub):
                    out[f"adc_t{m}"] = pd.Series([], dtype="object")
                yield out
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q_emb"]])
            if cells_arr is not None:
                x = x - cells_arr[pdf["probe_cl"].to_numpy(dtype="int64")]
            for m in range(n_sub):
                sub = x[:, m * sub_dim : (m + 1) * sub_dim]
                out[f"adc_t{m}"] = list(
                    ((sub[:, None, :] - books_arr[m][None, :, :]) ** 2).sum(-1)
                )
            yield out

    return queries.mapInPandas(tab, out_ddl)


def _adc_lookup() -> Column:
    """ADC distance from the precomputed per-query tables: 8 array
    lookups per scored row, nothing else."""
    adc = None
    for m in range(PQ_M):
        term = F.element_at(F.col(f"adc_t{m}"), F.col(f"code_{m}") + 1)
        adc = term if adc is None else adc + term
    return adc


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
    books = _trained_books(spark, sf_dir)
    base = pq_encode(
        e.filter(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("n_id"), "embedding", "label"
        ),
        books,
    ).drop("embedding")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # ADC: the per-subspace distance tables are computed ONCE per
    # query row (broadcast side), so each scored row only does 8
    # element_at lookups.
    q_tabled = _with_adc_tables(queries, books)
    scored = base.crossJoin(F.broadcast(q_tabled)).select(
        "q_id", "n_id", "label", F.round(_adc_lookup(), 6).alias("adc_dist")
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


def _ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int,
    vectors: DataFrame | None = None,
    cache_key: str = "",
    top_k: int | None = None,
    shortlist: int | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """IVFPQ with an explicit nprobe (the recall/cost lever) and an
    optional corpus override (``vectors``: any (vec_id, embedding,
    label) frame — the clustered-recall demonstration route, r13).
    See ``ann_ivfpq_topk`` for the full design notes."""
    top_k = TOP_K if top_k is None else top_k
    shortlist = SHORTLIST if shortlist is None else shortlist
    e = (
        vectors
        if vectors is not None
        else load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    corpus = e.filter(F.col("vec_id") >= N_QUERIES)
    centroids = _trained_coarse(spark, sf_dir, vectors=vectors, cache_key=cache_key)
    books = _trained_books(
        spark,
        sf_dir,
        vectors=vectors,
        cache_key=cache_key + ("::res" if by_residual else ""),
        residual_centroids=centroids if by_residual else None,
    )

    # corpus side: one vectorized narrow pass emits PQ codes AND the
    # nearest-centroid cell id; codes + cell only downstream
    base = pq_encode(
        corpus.select(F.col("vec_id").alias("n_id"), "embedding", "label"),
        books,
        cell_centroids=centroids,
        by_residual=by_residual,
    ).drop("embedding")

    # query side: ADC tables (vectorized) + the nprobe nearest cells
    # via one sorted literal struct array — narrow maps, no join
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    from .kmeans import _sq_dist

    q_dist_structs = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col("q_emb"), F.array(*[F.lit(float(x)) for x in c])).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    if by_residual:
        # residual ADC: one table set per (query, probed cell) — the
        # explode happens FIRST so the tables see q - centroid[cell]
        probes = _with_adc_tables(
            queries.withColumn(
                "probe_cl",
                F.explode(
                    F.transform(F.slice(q_dist_structs, 1, nprobe), lambda x: x["c"])
                ),
            ),
            books,
            cells=centroids,
        )
    else:
        probes = _with_adc_tables(queries, books).withColumn(
            "probe_cl",
            F.explode(F.transform(F.slice(q_dist_structs, 1, nprobe), lambda x: x["c"])),
        )

    # ADC through the cluster-keyed equi-join: the per-query distance
    # tables were computed above (once per probe row); each scored row
    # only does 8 element_at lookups against its probed cluster's codes
    scored = probes.join(base, F.col("probe_cl") == F.col("cl")).select(
        "q_id", "q_emb", "n_id", "label", F.round(_adc_lookup(), 6).alias("adc_dist")
    )
    ws = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("n_id"))
    shortlist_df = (
        scored.withColumn("rnk_adc", F.row_number().over(ws))
        .filter(F.col("rnk_adc") <= shortlist)
        .select("q_id", "n_id", "label", "adc_dist")
    )

    # exact re-rank on the shortlist only (keyed joins, no scan)
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
    candidates = shortlist_df.join(
        e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")),
        "n_id",
    ).join(F.broadcast(queries), "q_id")
    wr = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("n_id"))
    ivfpq_topk = (
        candidates.select(
            "q_id", "n_id", "label", "adc_dist", F.round(exact_d2, 6).alias("d2")
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", "n_id", "label", "adc_dist", "d2", "rnk")
    )

    # measured recall vs the exact-L2 brute force (documented
    # re-ranker shape; at corpus scale measured on a query sample)
    exact = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
        .crossJoin(F.broadcast(queries))
        .select("q_id", "n_id", exact_d2.alias("d2"))
    )
    we = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("n_id"))
    true_topk = (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", "n_id")
    )
    recall = (
        true_topk.join(ivfpq_topk.select("q_id", "n_id"), ["q_id", "n_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.round(F.count("*") / F.lit(top_k), 4).alias("recall_at_k"))
    )
    return ivfpq_topk.join(recall, "q_id", "left").na.fill({"recall_at_k": 0.0})


@query("ann_ivfpq_topk")  # kmeans-trained quantizers: engine-specific; rows-only + recall column
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ composition (FAISS IVFPQ shape): the coarse quantizer
    bounds WHICH codes each query scans, PQ bounds the BYTES per code.

    ``ann_pq_topk``'s ADC stage is a full-corpus scan per query
    (documented flat-PQ limitation); here every corpus vector is
    assigned to its nearest trained-kmeans centroid (literal-centroid
    argmin — a narrow map, no join) and PQ-encoded once, each query
    probes its NPROBE nearest cells, and ADC scoring happens through a
    keyed equi-join on the cluster id — scanned rows per query are
    bounded by the probed cells' sizes, NOT the corpus (no crossJoin
    against the coded corpus anywhere in the plan; asserted by
    tests/test_pq.py). The exact re-rank stays shortlist-bounded
    exactly as in flat PQ. RESIDUALS ``x - centroid[cell]`` are
    encoded (r14, FAISS's IVFPQ default): raw-vector codes collapse
    tight clusters onto one code word (measured 0.35 vs 0.89 recall
    on the clustered corpus, SCALE.md), while residual coding spends
    the codebook's resolution on the within-cell geometry — same plan
    shape, per-probe ADC tables instead of per-query ones.

    Recall accounting (measured, sf0.01): the fixture's embeddings
    are nearly ISOTROPIC — a true top-5 neighbor shares the query's
    label 8% of the time (random = 10%) — so ANY coarse router's
    coverage is ~proportional to the scanned fraction (trained
    k-means: 0.26/0.42/0.70 coverage at nprobe 1/2/5 of 10). The
    NPROBE=2 default therefore reads ~20% of the codes for ~0.42
    recall@5 (residual-coded, r14; raw coding measured 0.40), vs flat
    PQ's 0.76 at 100%: that is the honest trade on unclusterable
    data, and the routing itself is lossless — tests/test_pq.py
    asserts that at nprobe = all cells the raw-coded variant's top-k
    EQUALS flat PQ's (flat PQ has no cells to residualize against),
    and that residual coding at nprobe = all is never worse. On a real (clustered) corpus the same
    plan recovers flat-PQ recall at a fraction of the scan; the
    emitted recall_at_k column keeps the trade measurable wherever
    it runs. At 100 TB: centroids+codebooks broadcast (O(KiB)), the
    coded corpus is 64x smaller than the vectors, and the only
    corpus-sized shuffle is the one cluster-keyed exchange."""
    return _ivfpq_topk(spark, sf_dir, NPROBE, by_residual=True)
