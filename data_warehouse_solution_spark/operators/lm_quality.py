"""Corpus-trained language-model quality scoring (north-star text
analysis surface, BASELINE.json — the reference has no text analytics
at all; its pipeline is ingest-only, ``pipeline.py:196-249`` in
/root/reference).

The classic CCNet/KenLM-style quality gate scores every document by
the average log-probability its tokens get under a language model
trained on the corpus itself: boilerplate and in-distribution prose
score high, gibberish and outlier documents score low. Here the model
is an exact add-one-smoothed bigram LM — small enough to be fully
SQL-expressible (so the DuckDB oracle checks real values end to end)
while exercising the same plan shape a KenLM scorer would need.

Scale notes (100 TB): training is two hash aggregations over the
exploded bigram stream (bigram counts, context counts) — the same
single-shuffle shape as word-count, with map-side partial aggregation
doing most of the work. Scoring joins the exploded corpus back to the
two count tables on the bigram/context key: vocabulary-sized tables
(≪ corpus) that AQE broadcast-joins when small and degrades to keyed
shuffles when not — no driver materialization, no Python in the hot
path (everything is codegen'd column expressions). The only scalar
(vocab size) is a 1-row broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, spread

_BIGRAM_LM_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> [ws[i], ws[i + 1]])) AS pr
  FROM w
),
bg AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM b),
bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
cc AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS vocab
      FROM (SELECT unnest(ws) AS w FROM w))
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(LN((cb + 1.0) / (cu + vocab))), 6) AS lm_score
FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
GROUP BY bg.doc_id
"""


def bigram_lm_scores(d: DataFrame) -> DataFrame:
    """Score each document by its average bigram log-probability under
    an add-one-smoothed bigram model trained on the whole corpus:
    ``P(w2|w1) = (count(w1,w2) + 1) / (count(w1·) + |V|)``.

    Two aggregations train the model, two equi-joins apply it; the
    vocab-size scalar rides in on a 1-row broadcast.
    """
    ws = F.split(F.col("text"), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.element_at(ws, i + F.lit(1)).alias("w2"),
        ),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    # context counts derive from the bigram counts (sum of cb over w1
    # == count of w1-as-context occurrences) — a vocabulary-sized
    # aggregation instead of a second full-corpus shuffle; merging cu
    # onto bc also collapses the two apply-joins into one, so the
    # corpus-scale bigram stream shuffles twice total (train agg +
    # apply join), not four times.
    cc = bc.groupBy("w1").agg(F.sum("cb").alias("cu"))
    model = bc.join(cc, ["w1"])
    vocab = (
        d.select(F.explode(ws).alias("w"))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    scored = bg.join(model, ["w1", "w2"]).crossJoin(F.broadcast(vocab))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.avg(F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("vocab")))),
            6,
        ).alias("lm_score"),
    )


@query("quality_bigram_lm", oracle=_BIGRAM_LM_ORACLE)
def quality_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring with an exact in-corpus bigram
    model — per-doc average log-prob, value-checked against the DuckDB
    oracle (rounded to 6 dp)."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return bigram_lm_scores(d)
