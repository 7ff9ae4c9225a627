"""Distributed BPE tokenizer training over the documents corpus.

Byte-pair encoding (Sennrich et al. 2016, the tokenizer family behind
GPT/Llama vocabularies) trained the way industrial tokenizer
pipelines actually train it at corpus scale: the corpus is collapsed
to a (word, frequency) vocabulary table FIRST — one shuffle on the
word key with map-side combine, the only corpus-sized pass — and
every merge iteration then runs on that vocabulary table, whose size
is bounded by the number of DISTINCT words (millions at 100 TB, not
billions of rows). Per iteration: adjacent symbol pairs are exploded
from the space-delimited symbol strings (a narrow map), summed on
the pair key (a vocab-sized shuffle), and the argmax pair — an O(1)
driver collect, the same driver-coordination contract as the k-means
trainer in ``kmeans.py`` — is folded back into the symbol strings as
one literal ``F.replace``. Lineage is truncated each round with an
eager ``localCheckpoint`` (the label-propagation lesson in SCALE.md:
without it round k replays rounds 1..k-1), and every checkpoint is
freed before return.

Merge semantics (pinned, engine-portable): a merge of pair (x, y)
rewrites the delimited symbol string '' x y '' by NON-OVERLAPPING
LEFT-TO-RIGHT literal replacement of ' x y ' with ' xy '. For runs of
repeated symbols this differs from strict greedy BPE at the shared-
space boundary (' a a a a a ' -> ' aa a aa ', strict greedy gives
' aa aa a ') — a documented variant choice: Spark's ``F.replace``,
DuckDB's ``replace`` and Python ``str.replace`` all implement the
identical scan, which is what keeps every step value-oracled
cross-engine (pair counts are integer-exact, ties break on the pair
string). ``tests/test_bpe.py`` pins the boundary case on both
engines.

Reference parity: the reference corpus has no tokenizer surface —
this is north-star LLM-training-data capability (the token-budget
packing in ``sampling.py`` and the BPE-ish pre-tokenizer count in
``textops.py`` are the adjacent family members).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..plans import free_local_checkpoints
from ..registry import query
from ..tables import load_tables, spread

_STEPS = 5


def _oracle_ctes(steps: int) -> str:
    """The shared DuckDB CTE chain: w0 (word, symbols, freq) and, per
    step k, pair counts p{k}, argmax b{k}, rewritten vocabulary w{k}."""
    ctes = [
        """w0 AS (
  SELECT word,
         ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS symbols,
         COUNT(*) AS freq
  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY 1
)"""
    ]
    for k in range(1, steps + 1):
        p = k - 1
        ctes.append(
            f"""p{k} AS (
  SELECT a[i] || ' ' || a[i+1] AS pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(symbols), ' ') AS a, freq FROM w{p}),
       unnest(generate_series(1, len(a) - 1)) AS t(i)
  GROUP BY 1
)"""
        )
        ctes.append(
            f"b{k} AS (SELECT {k} AS step, pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            # LEFT JOIN ON TRUE (not CROSS JOIN): when a round finds no
            # adjacent pair, b{k} is empty and a cross join would EMPTY
            # the vocabulary — the Spark trainer instead breaks and
            # keeps the vocab, so w{k} must degrade to w{p} (COALESCE
            # makes replace() the identity on a NULL pair)
            f"""w{k} AS (
  SELECT word,
         replace(symbols, ' ' || COALESCE(pair, chr(0)) || ' ',
                 ' ' || replace(COALESCE(pair, chr(0)), ' ', '') || ' ') AS symbols,
         freq
  FROM w{p} LEFT JOIN b{k} ON TRUE
)"""
        )
    return ",\n".join(ctes)


_MERGES_ORACLE = (
    "WITH "
    + _oracle_ctes(_STEPS)
    + "\nSELECT CAST(step AS INT) AS step, replace(pair, ' ', '') AS merged, pair, cnt FROM ("
    + " UNION ALL ".join(f"SELECT * FROM b{k}" for k in range(1, _STEPS + 1))
    + ") ORDER BY step"
)

_TOKENIZE_ORACLE = (
    "WITH "
    + _oracle_ctes(_STEPS)
    + f""",
dw AS (
  SELECT doc_id, word, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(n * len(string_split(trim(symbols), ' '))) AS BIGINT) AS n_tokens
FROM dw JOIN w{_STEPS} USING (word)
GROUP BY 1
"""
)


def _word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, symbols, freq): the corpus collapsed to its vocabulary —
    the one corpus-sized shuffle of the trainer (word key, map-side
    combine). ``symbols`` is the space-delimited character sequence
    wrapped in sentinel spaces so merges are literal replacements."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    words = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq")).withColumn(
        "symbols",
        F.concat(
            F.lit(" "),
            F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), " "),
            F.lit(" "),
        ),
    )


def train_bpe_merges(
    spark: SparkSession, sf_dir: str, steps: int = _STEPS
) -> tuple[list[Row], DataFrame]:
    """Run ``steps`` merge iterations; returns (merge rows, final
    vocabulary DataFrame). Each iteration shuffles only the vocab
    table on the pair key and collects exactly ONE row (the argmax
    pair, ties broken on the pair string); the winning rule is folded
    back as a literal replace — no corpus re-scan ever happens."""
    vocab = _word_vocab(spark, sf_dir).localCheckpoint(eager=True)
    checkpoints = [vocab]
    merges: list[Row] = []
    arr = F.split(F.trim(F.col("symbols")), " ")
    for k in range(1, steps + 1):
        pairs = (
            vocab.select(arr.alias("a"), "freq")
            .select(
                F.explode(
                    F.expr("transform(slice(a, 1, size(a) - 1), (x, i) -> concat(x, ' ', a[i + 1]))")
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
        if not best:
            break  # vocabulary fully merged — nothing adjacent remains
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        merged = pair.replace(" ", "")
        merges.append(Row(step=k, merged=merged, pair=pair, cnt=cnt))
        vocab = vocab.withColumn(
            "symbols",
            F.replace(F.col("symbols"), F.lit(f" {pair} "), F.lit(f" {merged} ")),
        ).localCheckpoint(eager=True)
        checkpoints.append(vocab)
    for cp in checkpoints[:-1]:
        free_local_checkpoints(cp)
    return merges, vocab


@query("bpe_train_merges", oracle=_MERGES_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``_STEPS`` BPE merge rules learned from the corpus:
    (step, merged symbol, source pair, integer pair count) — exact
    cross-engine (integer counts, lexicographic tie-break, pinned
    replace semantics)."""
    merges, vocab = train_bpe_merges(spark, sf_dir)
    free_local_checkpoints(vocab)
    out = spark.createDataFrame(merges, schema="step int, merged string, pair string, cnt bigint")
    return out.orderBy("step")


@query("bpe_tokenize_counts", oracle=_TOKENIZE_ORACLE)
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to tokenize the corpus: per-doc
    post-merge token counts. The apply path is the production shape —
    token counts come from the (word -> merged symbol count) vocab
    table joined to per-doc word counts, so document bodies are
    tokenized via their vocabulary projection, never re-scanned per
    merge rule. The vocab side is DISTINCT-words-sized, far under
    the broadcast threshold at any corpus scale (and keyed-join-able
    beyond it)."""
    _, vocab = train_bpe_merges(spark, sf_dir)
    per_word = vocab.select(
        "word", F.size(F.split(F.trim(F.col("symbols")), " ")).alias("n_sym")
    )
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    dw = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
    )
    out = (
        dw.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("n_sym")).alias("n_tokens"))
    )
    from ..plans import materialize_and_release

    out = materialize_and_release(out)  # result-sized checkpoint
    free_local_checkpoints(vocab)  # vocab checkpoint now provably dead
    return out
