"""BM25 ranked retrieval over the documents corpus.

Completes the text-analysis family (``textops.py`` has TF/DF/IDF term
stats and exact TF-IDF): Okapi BM25 (k1=1.2, b=0.75) scoring of a
multi-term keyword query, returning the top-k documents. This is the
scoring function behind every classical search engine and the usual
first-stage retriever in RAG / training-data curation stacks (recall
candidates cheaply, re-rank with embeddings — the embedding re-ranker
is ``similarity.ann_bruteforce_topk``).

Determinism discipline: the only transcendental is the IDF's LN —
each per-term contribution is rounded to 6 decimals (repo convention,
see ``lm_quality.py``) and cast to DECIMAL before the per-doc SUM, so
the multi-row reduction is exact and the final ordering (score DESC,
doc_id) is identical across engines; top-k is a rank filter, never a
bare LIMIT (a LIMIT under ties is nondeterministic).

100 TB shape: one explode of the corpus filtered to the query's terms
(predicate on the token BEFORE any shuffle, so the keyed aggregate
sees only matching postings — for a q-term query that is O(postings
of q), not O(corpus tokens)); doc-length stats ride the same scan;
the per-term DF table and corpus stats are broadcast. The final
global top-k is Spark's TakeOrdered pattern over per-partition
partial top-k.

Reference parity: the reference's corpus has no search surface — this
is north-star text-analysis capability (BASELINE.json) layered on the
same documents table as the rest of the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, spread


def ranked_topk(scored: DataFrame, score, id_col: str, k: int, rank_name: str) -> DataFrame:
    """Distributed, deterministic global top-k WITH dense 1..k ranks.

    ``orderBy(score DESC, id).limit(k)`` compiles to Spark's
    TakeOrderedAndProject — per-partition partial top-k reduced on the
    driver-side heap, never a full sort, never a single-partition
    shuffle of the scored set. Ranks are then assigned by a window over
    the ≤k survivors only: the plan DOES contain an unpartitioned
    WindowExec, but its input is bounded by the limit below it (k rows,
    not the corpus), which is the shape the registry-wide sweep in
    ``tests/test_layout.py`` verifies. The (score DESC, id) key is a
    total order, so both the cutoff and the ranks are deterministic
    under score ties."""
    top = scored.orderBy(score.desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(score.desc(), F.col(id_col))
    return top.withColumn(rank_name, F.row_number().over(w))

_QUERY_TERMS = ("spark", "join", "window")
_K1 = 1.2
_B = 0.75
_TOP_K = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         LEN(string_split_regex(lower(text), '\\s+')) AS dl,
         unnest(string_split_regex(lower(text), '\\s+')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf
  FROM tok WHERE w IN ({_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(LEN(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
           / COUNT(*) AS avgdl
  FROM documents
),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
           * ((tf * {_K1 + 1.0!r})
              / (tf + {_K1!r} * ({1.0 - _B!r} + {_B!r} * (dl / avgdl)))),
           6) AS DECIMAL(18,6)) AS c
  FROM tf JOIN dfreq USING (w) CROSS JOIN stats
),
scored AS (SELECT doc_id, SUM(c) AS s FROM contrib GROUP BY 1)
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rnk,
       CAST(s AS DOUBLE) AS bm25
FROM scored
QUALIFY rnk <= {_TOP_K}
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the fixed keyword query
    ``{spark, join, window}`` — exact decimal score reduction; the
    cutoff is TakeOrderedAndProject on the (score DESC, doc_id) total
    order and ranks are assigned over the ≤k survivors
    (deterministic under ties, no corpus-wide single-partition
    sort)."""
    scored = _bm25_scored(spark, sf_dir)
    return ranked_topk(scored, F.col("s"), "doc_id", _TOP_K, "rnk").select(
        "doc_id", "rnk", F.col("s").cast("double").alias("bm25")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s) exact-decimal BM25 scores for ``_QUERY_TERMS`` —
    shared by the top-k query above and the hybrid fusion below."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    toks = F.split(F.lower("text"), r"\s+")
    docs = d.select("doc_id", F.size(toks).alias("dl"), toks.alias("tk"))
    stats = F.broadcast(
        docs.agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("tk").alias("w"))
        .filter(F.col("w").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "dl", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = F.broadcast(tf.groupBy("w").agg(F.count("*").alias("df")))
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * (F.col("dl") / F.col("avgdl")))
    )
    contrib = tf.join(dfreq, "w").join(stats).select(
        "doc_id", F.round(idf * sat, 6).cast("decimal(18,6)").alias("c")
    )
    return contrib.groupBy("doc_id").agg(F.sum("c").alias("s"))


_RRF_K = 60  # the standard reciprocal-rank-fusion constant
_CAND = 50  # candidates taken from each ranker
_HYBRID_TOP = 10

# semantic side: document doc_id's embedding is embeddings.vec_id
# (aligned synthetic fixtures); the query vector is vec_id 0's
_HYBRID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         LEN(string_split_regex(lower(text), '\\s+')) AS dl,
         unnest(string_split_regex(lower(text), '\\s+')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf
  FROM tok WHERE w IN ({_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(LEN(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
           / COUNT(*) AS avgdl
  FROM documents
),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
           * ((tf * {_K1 + 1.0!r})
              / (tf + {_K1!r} * ({1.0 - _B!r} + {_B!r} * (dl / avgdl)))),
           6) AS DECIMAL(18,6)) AS c
  FROM tf JOIN dfreq USING (w) CROSS JOIN stats
),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, doc_id) AS lex_rank
  FROM contrib WHERE doc_id <> 0 GROUP BY doc_id
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0),
sem_scored AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q_emb)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q_emb, q_emb))), 6) AS sim
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> 0
),
sem AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS sem_rank
  FROM sem_scored
),
cands AS (
  SELECT doc_id, lex_rank, sem_rank
  FROM (SELECT * FROM lex WHERE lex_rank <= {_CAND}) l
  FULL OUTER JOIN (SELECT * FROM sem WHERE sem_rank <= {_CAND}) s USING (doc_id)
),
fused AS (
  SELECT doc_id, lex_rank, sem_rank,
         COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0) AS rrf
  FROM cands
)
SELECT doc_id, lex_rank, sem_rank, ROUND(rrf, 6) AS rrf,
       ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
FROM fused
QUALIFY rnk <= {_HYBRID_TOP}
"""


@query("hybrid_rrf_retrieval", oracle=_HYBRID_ORACLE)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval with reciprocal-rank fusion
    (k=60) — the standard first-stage RAG retriever: BM25 over the
    corpus and exact cosine against a query embedding each nominate
    their top-50, and a full-outer rank fusion scores
    1/(60+r_lex) + 1/(60+r_sem). Ranks are integers and the fusion is
    two fixed-order IEEE terms, so the whole composition stays
    value-oracled; the top-10 cutoff is a rank filter with doc_id
    tie-break (deterministic under ties).

    100 TB shape: each ranker's cost is its own (BM25: postings of
    the query terms; cosine: one broadcast query vector against the
    embedding corpus — swap in the IVF path for real scale); the
    fusion joins two 50-row frames. This is a composition, not new
    machinery — which is the point: the registry's rankers fuse
    without any shared state."""
    sem_scored = _sem_scored_bruteforce(spark, sf_dir)
    return _fuse_rrf(_lex_candidates(spark, sf_dir), sem_scored)


def _lex_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lex_rank): BM25 top-``_CAND`` via TakeOrdered + rank
    over the ≤``_CAND`` survivors."""
    scored = _bm25_scored(spark, sf_dir).filter(F.col("doc_id") != 0)
    return ranked_topk(scored, F.col("s"), "doc_id", _CAND, "lex_rank").select(
        "doc_id", "lex_rank"
    )


def _sem_scored_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sim): exact cosine of every corpus embedding against
    the broadcast query vector — the flat scan the IVF variant below
    replaces with a cell-routed probe."""
    from .similarity import cosine

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
    )


def _fuse_rrf(lex: DataFrame, sem_scored: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of the lexical candidates with a scored
    semantic side: rank the semantic scores (TakeOrdered top-``_CAND``
    + bounded rank), full-outer join, fuse, and take the global
    top-``_HYBRID_TOP`` the same distributed way."""
    sem = ranked_topk(sem_scored, F.col("sim"), "doc_id", _CAND, "sem_rank").select(
        "doc_id", "sem_rank"
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return ranked_topk(fused, F.col("rrf"), "doc_id", _HYBRID_TOP, "rnk").select(
        "doc_id", "lex_rank", "sem_rank", F.round("rrf", 6).alias("rrf"), "rnk"
    )


@query("hybrid_rrf_retrieval_ivf", oracle=_HYBRID_ORACLE)
def hybrid_rrf_retrieval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid RRF retriever with its semantic side routed through
    the IVF coarse quantizer (the composition ``similarity.
    ann_ivf_topk`` uses): the query probes cells and exact cosine runs
    only inside probed cells, reached by a keyed equi-join on the cell
    id instead of a flat corpus scan. Here nprobe = ALL cells, so the
    result is value-identical to ``hybrid_rrf_retrieval`` (same DuckDB
    oracle, identical top-10 asserted in tests) while exercising the
    scale plan; a real deployment drops nprobe to a handful of cells
    and the scan cost falls proportionally.

    100 TB shape: the probed-cell list is O(nprobe) rows broadcast to
    the corpus side; the scoring join is an equi-join on the cell id,
    so each task reads only its cells' postings — the flat
    crossJoin-the-corpus scan of the brute-force variant never
    happens."""
    from .similarity import cosine

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # nprobe=all: every cell (the label column is the cell id, as in
    # ann_ivf_topk) is probed — the probe list is tiny either way.
    probes = F.broadcast(
        e.select(F.col("label").alias("cell")).distinct().crossJoin(F.broadcast(qv))
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    sem_scored = (
        e.filter(F.col("vec_id") != 0)
        .join(probes, F.col("label") == F.col("cell"))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
    )
    return _fuse_rrf(_lex_candidates(spark, sf_dir), sem_scored)
