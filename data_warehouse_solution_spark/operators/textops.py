"""Text analysis operators over the documents table (SURVEY §2.C):
token counting, quality scoring, language-ID heuristic, document
fingerprinting, TF-IDF-style term statistics.

All are built-in expressions (split/regexp/aggregate) — per-document
work is embarrassingly parallel and shuffles only small derived
values, which is exactly what a 100 TB curation pass needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, spread

# tiny per-language marker lexicons for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "fast", "slow", "small", "big"],
    "de": ["der", "die", "das", "und", "ein", "nicht", "schnell"],
    "fr": ["le", "la", "les", "et", "un", "une", "vite"],
    "es": ["el", "la", "los", "y", "un", "una", "rapido"],
}

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in"]


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           LEN(string_split_regex(text, '\\s+')) AS n_tokens,
           LEN(list_distinct(string_split_regex(text, '\\s+'))) AS n_unique_tokens,
           LENGTH(text) AS n_chars_measured,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + distinct-token counts; cross-checks
    the fixture's own n_chars column."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.split(F.col("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").alias("n_chars_measured"),
        "n_chars",
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             LEN(string_split_regex(text, '\\s+')) AS n_tokens,
             LENGTH(text) AS n_chars_m,
             LENGTH(regexp_replace(text, '[a-z ]', '', 'g')) AS n_nonalpha,
             LEN(list_filter(string_split_regex(text, '\\s+'),
                             w -> list_contains({_STOPWORDS!r}, w))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens,
           ROUND(n_nonalpha * 1.0 / n_chars_m, 6) AS punct_ratio,
           ROUND(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
           CASE WHEN n_tokens BETWEEN 10 AND 1000
                 AND n_nonalpha * 1.0 / n_chars_m < 0.3
                THEN 1 ELSE 0 END AS passes_quality
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter features: length band, punctuation ratio,
    stopword ratio — the standard pre-training corpus gate."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.split(F.col("text"), r"\s+")
    n_tokens = F.size(toks)
    n_chars_m = F.length("text")
    n_nonalpha = F.length(F.regexp_replace(F.col("text"), "[a-z ]", ""))
    stopset = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stopset, w)))
    punct_ratio = n_nonalpha / n_chars_m
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.when(n_tokens.between(10, 1000) & (punct_ratio < 0.3), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = _LANG_MARKERS[lang]
    return (
        f"LEN(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"w -> list_contains({markers!r}, w)))"
    )


_LANG_ORACLE = f"""
WITH scores AS (
  SELECT doc_id, lang AS labeled_lang,
         {_lang_score_sql("en")} AS s_en,
         {_lang_score_sql("de")} AS s_de,
         {_lang_score_sql("fr")} AS s_fr,
         {_lang_score_sql("es")} AS s_es
  FROM documents
)
SELECT doc_id, labeled_lang,
       CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM scores
"""


@query("text_language_id", oracle=_LANG_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language-ID heuristic with a deterministic
    argmax tie-break order (en > de > fr > es > und)."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def score(lang: str):
        markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda w: F.array_contains(markers, w)))

    s_en, s_de, s_fr, s_es = (score(lang) for lang in ("en", "de", "fr", "es"))
    pred = (
        F.when(F.greatest(s_en, s_de, s_fr, s_es) == 0, "und")
        .when(s_en >= F.greatest(s_de, s_fr, s_es), "en")
        .when(s_de >= F.greatest(s_fr, s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_hash,
           md5(array_to_string(string_split_regex(lower(text), '\\s+')[1:8], ' ')) AS prefix_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whitespace-normalized full-text hash +
    first-8-token prefix hash (cheap near-dup blocking keys)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    prefix = F.concat_ws(" ", F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 8))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.md5(prefix).alias("prefix_hash"),
    )


@query(
    "text_edit_distance",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             array_to_string(string_split(text, ' ')[1:3], ' ') AS blk,
             substr(text, 1, 60) AS prefix
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.prefix, b.prefix) AS edit_dist
    FROM keyed a JOIN keyed b ON a.blk = b.blk AND a.doc_id < b.doc_id
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: Levenshtein distance between 60-char prefixes
    of documents sharing a 3-word blocking key. Blocking-then-edit-
    distance is the classic record-linkage shape — the quadratic
    metric only runs inside blocks, so it scales with block size, not
    corpus size."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    keyed = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3)).alias("blk"),
        F.substring("text", 1, 60).alias("prefix"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("edit_dist"),
        )
    )


@query(
    "scalar_array_setops",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_intersect(ws, {_STOPWORDS!r})), '|'), '')
             AS stop_hits,
           LEN(list_filter(ws, w -> NOT list_contains({_STOPWORDS!r}, w))) AS n_content,
           LEN(list_distinct(list_concat(ws, {_STOPWORDS!r}))) AS n_union
    FROM toks
    """,
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / except / union) against a
    literal word set, outputs sorted so element-order differences
    between engines can't flap the check."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    ws = F.array_distinct(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        F.concat_ws("|", F.array_sort(F.array_intersect(ws, stop))).alias("stop_hits"),
        F.size(F.array_except(ws, stop)).alias("n_content"),
        F.size(F.array_distinct(F.array_union(ws, stop))).alias("n_union"),
    )


@query("agg_approx_percentile")  # t-digest sketch: rows-only; tolerance unit-tested
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based quantile estimator that
    replaces exact percentile at 100 TB (exact needs a full sort per
    group; the sketch merges in one pass). Accuracy vs the exact
    percentile is asserted in tests."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
    )


@query(
    "text_term_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
      FROM documents
    ),
    tf AS (SELECT w, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
           FROM tok GROUP BY w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT w AS term, term_freq, doc_freq,
           ROUND(LN(n_docs * 1.0 / doc_freq), 6) AS idf
    FROM tf, n
    WHERE doc_freq >= 50
    """,
)
def text_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics (TF / DF / IDF) — the aggregation
    backbone of TF-IDF, facet counts and vocabulary pruning. One
    explode + one groupBy shuffle keyed on the term."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    # corpus size as a broadcast scalar inside ONE plan (no separate
    # driver-side count job)
    n_docs = F.broadcast(d.agg(F.count("*").alias("n_docs")))
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    return (
        tok.groupBy(F.col("w").alias("term"))
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= 50)
        .join(n_docs)
        .select(
            "term",
            "term_freq",
            "doc_freq",
            F.round(F.log(F.col("n_docs").cast("double") / F.col("doc_freq")), 6).alias("idf"),
        )
    )


@query(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           LEN(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
           LEN(regexp_extract_all(lower(text), '[0-9]+')) AS n_number_tokens,
           LEN(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS n_symbol_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (word / number / symbol classes —
    the pre-tokenizer split BPE vocabularies are trained on), counted
    per document. Same regex dialect subset in both engines."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all(low, F.lit(r"[0-9]+"), 0)).alias("n_number_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(r"[^a-z0-9\s]"), 0)).alias("n_symbol_tokens"),
    )


@query(
    "text_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(lower(text), '\\s+'),
                              w -> CAST(LENGTH(w) * 31 + ascii(w) AS BIGINT))),
             (acc, c) -> (acc * 257 + c) % 2147483647) AS doc_hash
    FROM documents
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the word sequence (order-
    sensitive document fingerprint, unlike the bag-of-words md5):
    acc = (acc*257 + code(word)) mod 2^31-1 with a cross-engine word
    code (length*31 + first-char codepoint). Left fold in both
    engines."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = F.split(F.lower(F.col("text")), r"\s+")
    codes = F.transform(
        words, lambda w: (F.length(w) * 31 + F.ascii(w)).cast("long")
    )
    doc_hash = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 257 + c) % F.lit(2147483647).cast("long"),
    )
    return d.select("doc_id", doc_hash.alias("doc_hash"))


# cross-engine-safe regexes (Java regex and RE2 common subset)
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\d{3}-\\d{3}-\\d{4}"

_PII_ORACLE = f"""
WITH synth AS (
  SELECT c_custkey,
         'Contact ' || lower(regexp_replace(c_name, '#', '', 'g')) ||
         '@example.com or call 555-' ||
         lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') ||
         ' about the order.' AS msg
  FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(msg, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       CAST(LEN(regexp_extract_all(msg, '{_EMAIL_RE}'))
            + LEN(regexp_extract_all(msg, '{_PHONE_RE}')) AS BIGINT) AS n_pii
FROM synth
"""


@query("text_pii_redact", oracle=_PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance scrub every training-data
    pipeline runs before tokenization: emails and phone numbers are
    replaced with typed placeholder tokens and counted per record.
    Pure regexp_replace/extract_all column expressions (codegen'd, no
    Python); patterns restricted to the Java-regex/RE2 common subset
    so the operator is engine-portable. The fixture has no real PII,
    so the test harness synthesizes deterministic emails/phones from
    customer fields identically in both engines — the redaction logic
    under test is exactly the production expression."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    msg = F.concat(
        F.lit("Contact "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" about the order."),
    )
    synth = c.select("c_custkey", msg.alias("msg"))
    redacted = F.regexp_replace(
        F.regexp_replace("msg", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    n_pii = (
        F.size(F.regexp_extract_all("msg", F.lit(_EMAIL_RE), 0))
        + F.size(F.regexp_extract_all("msg", F.lit(_PHONE_RE), 0))
    ).cast("bigint")
    return synth.select("c_custkey", redacted.alias("redacted"), n_pii.alias("n_pii"))


_NORMALIZE_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       CAST(LENGTH(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                       ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""


@query("text_normalize", oracle=_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, strip non-alphanumerics,
    collapse whitespace) — the preprocessing step upstream of exact
    dedup and shingling, so that case/punctuation variants of the same
    document hash identically. Narrow map over the scan; the regex set
    stays in the Java/RE2 common subset for engine portability."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " ")
    )
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).cast("bigint").alias("n_chars_norm")
    )


# sliding chunk geometry: 20-token windows every 15 tokens (5-token
# overlap). Tuned to the fixture's ~30-60-token docs so multi-chunk
# docs and short tail chunks are both exercised by the correctness
# gate; production values (512/448 etc.) are config.
_CHUNK_WINDOW = 20
_CHUNK_STRIDE = 15

_CHUNK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), chunks AS (
  SELECT doc_id,
         [(i - 1) // {_CHUNK_STRIDE}
          for i in range(1, len(w) + 1, {_CHUNK_STRIDE})] AS ids,
         [array_to_string(w[i:i+{_CHUNK_WINDOW - 1}], ' ')
          for i in range(1, len(w) + 1, {_CHUNK_STRIDE})] AS texts,
         [len(w[i:i+{_CHUNK_WINDOW - 1}])
          for i in range(1, len(w) + 1, {_CHUNK_STRIDE})] AS lens
  FROM toks
)
SELECT doc_id, CAST(unnest(ids) AS INT) AS chunk_id,
       unnest(texts) AS chunk_text,
       CAST(unnest(lens) AS BIGINT) AS chunk_tokens
FROM chunks
"""


@query("document_chunking", oracle=_CHUNK_ORACLE)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    overlapping token windows (window ``_CHUNK_WINDOW``, stride
    ``_CHUNK_STRIDE``) — the step that turns curated documents into
    embedding/training units in a RAG or pre-training pipeline. One
    narrow map + explode; no shuffle, chunk text never exceeds the
    window, and the explode fan-out is len/stride per doc (bounded),
    so the shape survives any corpus size."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    base = d.select("doc_id", F.split("text", r"\s+").alias("w"))
    chunk = F.expr(
        f"""transform(sequence(1, size(w), {_CHUNK_STRIDE}),
               s -> struct(cast((s-1) div {_CHUNK_STRIDE} as int) as chunk_id,
                           concat_ws(' ', slice(w, s, {_CHUNK_WINDOW})) as chunk_text,
                           cast(size(slice(w, s, {_CHUNK_WINDOW})) as bigint)
                             as chunk_tokens))"""
    )
    return base.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id", "c.chunk_id", "c.chunk_text", "c.chunk_tokens"
    )


_TFIDF_EXACT_ORACLE = r"""
WITH ex AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY term
), n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df,
       ROUND(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
"""


@query("text_tfidf_exact", oracle=_TFIDF_EXACT_ORACLE)
def text_tfidf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF (tf x ln(N/df), no hashing, no smoothing) — the
    value-oracled counterpart of text_tfidf_mllib (whose HashingTF
    buckets are engine-specific and therefore rows-only). Two keyed
    aggregations — (doc, term) then term — both with map-side partial
    agg; the document-count scalar joins in as a broadcast literal.
    At 100 TB the term dictionary is Zipf-skewed: the df aggregation
    is exactly the heavy-hitter shuffle AQE's skew split handles, and
    stopword-class terms can be pre-dropped (cf. the curation gates)
    to cut the fan-in."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    ex = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = ex.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.count()
    return (
        tf.join(df_, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
