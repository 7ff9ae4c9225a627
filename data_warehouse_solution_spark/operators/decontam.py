"""Benchmark decontamination and repetition-quality operators over the
documents table — two curation steps every large-scale training-data
pipeline runs between ingest and sampling (north-star extension
surface, BASELINE.json; the reference pipeline has no notion of
either — its whole query surface is the verb whitelist at
``pipeline.py:110-114`` in /root/reference).

Scale notes (100 TB):

- Decontamination is the n-gram-join shape: corpus-side n-grams are a
  narrow map (no strings wider than the window materialize per row
  beyond the gram list), the benchmark side is tiny by construction
  (eval sets are MBs, corpora are TBs) and goes through the size-gated
  broadcast, so the only wide movement is one shuffle of
  (gram, doc_id) pairs keyed by gram. Ultra-frequent grams are the
  skew hazard at 1000 executors; production mitigations are a
  benchmark-side document-frequency cutoff (drop grams appearing in
  most benchmark docs — they carry no signal) and a longer window
  (8-13 words in published decontamination setups, which makes grams
  near-unique); the 3-word window here only reflects the fixture's
  ~30-word documents.
- The repetition scorer is per-row array arithmetic only — zero
  shuffles, embarrassingly parallel, runs entirely JVM-side. The
  O(distinct-words x words) inner loop is bounded by document length,
  the same bound any single-pass quality scorer carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import maybe_broadcast
from ..registry import query
from ..tables import load_tables, spread

# every 17th document stands in for the held-out benchmark/eval set
_BENCH_MOD = 17
# flag a corpus doc that shares >= this many distinct 3-grams with one
# benchmark doc
_MIN_SHARED = 3

_DECONTAM_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
), grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]) AS gs
  FROM toks WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
)
SELECT c.doc_id AS doc_id, b.doc_id AS bench_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM ex c JOIN ex b USING (g)
WHERE b.doc_id % {_BENCH_MOD} = 0 AND c.doc_id % {_BENCH_MOD} <> 0
GROUP BY 1, 2
HAVING COUNT(*) >= {_MIN_SHARED}
"""


@query("decontaminate_ngram_overlap", oracle=_DECONTAM_ORACLE)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag (corpus doc, benchmark doc)
    pairs sharing >= ``_MIN_SHARED`` distinct word 3-grams — the
    n-gram-overlap check run before training to keep eval data out of
    the training mix. Both sides deduplicate grams per document first,
    so COUNT(*) after the gram equi-join is exactly the number of
    shared distinct grams. The benchmark side is broadcast when small
    (size-gated); the corpus side never moves except as (gram, id)
    pairs."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    w = F.split(F.lower(F.col("text")), r"\s+")
    base = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 3)
    grams = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', slice(w, i, 3)))"
                )
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .withColumnRenamed("doc_id", "bench_doc_id")
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(maybe_broadcast(bench), "g")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


_REPETITION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
), feats AS (
  SELECT doc_id, len(w) AS n_tokens,
         list_max(list_transform(list_distinct(w),
                                 x -> len(list_filter(w, y -> y = x))))
           AS top_cnt,
         [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS bg
  FROM toks WHERE len(w) >= 2
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(top_cnt * 1.0 / n_tokens, 6) AS top_word_frac,
       ROUND(1.0 - len(list_distinct(bg)) * 1.0 / len(bg), 6)
         AS dup_bigram_frac,
       (top_cnt * 1.0 / n_tokens > 0.2 OR
        1.0 - len(list_distinct(bg)) * 1.0 / len(bg) > 0.1) AS repetitive
FROM feats
"""


@query("quality_gopher_repetition", oracle=_REPETITION_ORACLE)
def quality_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features: fraction of tokens that are
    the single most frequent word, and fraction of duplicated word
    bigrams — the published repetition gates for pre-training corpora
    (high values indicate boilerplate/spam). Computed entirely with
    per-row array lambdas: no explode, no shuffle, no Python."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    w = F.split(F.lower(F.col("text")), r"\s+")
    base = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    top_cnt = F.array_max(
        F.expr("transform(array_distinct(w), x -> size(filter(w, y -> y = x)))")
    )
    bg = F.expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"
    )
    feats = base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        top_cnt.alias("top_cnt"),
        bg.alias("bg"),
    )
    top_frac = F.col("top_cnt") / F.col("n_tokens")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("bg")) / F.size("bg")
    return feats.select(
        "doc_id",
        "n_tokens",
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
        ((top_frac > 0.2) | (dup_frac > 0.1)).alias("repetitive"),
    )


# a 5-gram is boilerplate when >= this many distinct docs contain it
_BOILER_MIN_DOCS = 2

_BOILERPLATE_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, i AS pos,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
             ws[i+3] || ' ' || ws[i+4] AS gram
      FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
freq AS (SELECT gram FROM g
         GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}),
cov AS (SELECT DISTINCT g.doc_id, g.pos + j AS pos
        FROM g JOIN freq USING (gram), unnest(generate_series(0, 4)) AS u(j)),
words AS (SELECT doc_id, i AS pos, ws[i] AS wd
          FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
kept AS (SELECT words.* FROM words ANTI JOIN cov USING (doc_id, pos)),
cleaned AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
                   string_agg(wd, ' ' ORDER BY pos) AS cleaned_text
            FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CAST(LEN(string_split(d.text, ' ')) AS BIGINT) AS n_tokens_orig,
       COALESCE(c.n_tokens_kept, 0) AS n_tokens_kept,
       COALESCE(c.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN cleaned c USING (doc_id)
"""


@query("boilerplate_ngram_removal", oracle=_BOILERPLATE_ORACLE)
def boilerplate_ngram_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate scrub, exact: any 5-gram occurring in >= 2
    distinct documents is corpus-level boilerplate; every token
    position covered by such a 5-gram is dropped and the remaining
    tokens are re-joined in order (docs that are pure boilerplate come
    back empty rather than disappearing). This is the span-removal
    counterpart of dedup: instead of dropping whole near-dup docs it
    surgically removes the shared template text.

    Scale (100 TB): one shuffle keyed on the 5-gram to find frequent
    grams (map-side partial agg collapses the heavy hitters), one
    keyed join back (the frequent-gram table is tiny relative to the
    corpus -> AQE broadcast), and one per-doc re-aggregation keyed on
    doc_id. Token positions, not document bodies, are what moves in
    the covered-position shuffle. The collect_list re-assembly is
    bounded by document length — the same per-row bound every
    tokenizer carries.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    ws = F.split(F.col("text"), " ")

    def gram_at(i):
        return F.concat_ws(
            " ", *[F.element_at(ws, i + F.lit(j)) for j in range(5)]
        )

    starts = F.when(
        F.size(ws) >= 5, F.sequence(F.lit(1), F.size(ws) - 4)
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(i.alias("pos"), gram_at(i).alias("gram")),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    freq = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BOILER_MIN_DOCS)
        .select("gram")
    )
    # boilerplate START positions per doc (one doc-keyed shuffle);
    # span expansion and token removal then happen as per-doc ARRAY
    # ops — the earlier form exploded covered positions, anti-joined a
    # posexploded words table and collect_list-reassembled the text:
    # three more shuffles of position rows for the same answer, and
    # the stage count (not data volume) dominates at this corpus size.
    starts_per_doc = (
        grams.join(maybe_broadcast(freq), "gram")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("bstarts"))
    )
    covered_arr = F.array_distinct(
        F.flatten(
            F.transform(F.col("bstarts"), lambda s: F.sequence(s, s + F.lit(4)))
        )
    )
    kept_tokens = F.filter(
        F.transform(ws, lambda w, i: F.struct((i + 1).alias("pos"), w.alias("wd"))),
        lambda x: ~F.array_contains(F.coalesce(F.col("cov"), F.array().cast("array<int>")), x["pos"]),
    )
    return (
        d.join(starts_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size(ws).cast("bigint").alias("n_tokens_orig"),
            F.coalesce(covered_arr, F.array().cast("array<int>")).alias("cov"),
            F.col("text"),
        )
        .select(
            "doc_id",
            "n_tokens_orig",
            F.size(kept_tokens).cast("bigint").alias("n_tokens_kept"),
            F.array_join(
                F.transform(kept_tokens, lambda x: x["wd"]), " "
            ).alias("cleaned_text"),
        )
    )
