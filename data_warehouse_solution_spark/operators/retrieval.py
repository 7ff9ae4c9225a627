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
    ``{spark, join, window}`` — exact decimal score reduction, rank
    filter for the cutoff (deterministic under ties)."""
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
    scored = contrib.groupBy("doc_id").agg(F.sum("c").alias("s"))
    w = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    return (
        scored.select(
            "doc_id",
            F.row_number().over(w).alias("rnk"),
            F.col("s").cast("double").alias("bm25"),
        )
        .filter(F.col("rnk") <= _TOP_K)
    )
