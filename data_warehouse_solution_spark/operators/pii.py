"""PII detection / redaction over the documents table.

The reference anonymizes COLUMNS at ingest (``pipeline.py:82-83``
hash/encrypt of whole fields); a training-data pipeline additionally
needs IN-TEXT scrubbing — find and mask emails / IPv4s / SSNs / phone
numbers embedded in free text before the corpus ships. Everything here
is JVM-side ``regexp_replace`` / ``regexp_extract_all`` over leftmost
matches of RE2-compatible patterns (no backrefs, no lookaround), so:

- per-document work is embarrassingly parallel, zero shuffle — the
  100 TB pass is scan-bandwidth-bound like every other narrow map;
- the SAME pattern strings run under DuckDB's RE2 for the value
  oracle, making the redaction semantics (not just row counts)
  differential-tested.

The fixture corpus contains no organic PII, so each query first
INJECTS deterministic doc_id-derived PII with identical expressions
in both engines — the oracle then proves detector and scrubber agree
byte-for-byte (md5 of the redacted text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

# one source of truth per pattern, interpolated into BOTH engines.
# RE2-safe subset: character classes, bounded repeats, \b word edges.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}
# fixed application order: email strips its digits before the numeric
# patterns run; ssn (3-2-4 groups) and phone (3-3-4) are disjoint.
PII_ORDER = ("email", "ipv4", "ssn", "phone")


def redact_pii(col: Column) -> Column:
    """Mask every PII match in ``col`` with its [TYPE] token — chained
    built-in regexp_replace, one codegen stage, no UDF."""
    out = col
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    return {
        kind: F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0)))
        for kind in PII_ORDER
    }


def _with_injected_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a ``pii_text`` column carrying doc_id-derived
    synthetic PII (the fixture text has none); docs where
    doc_id % 5 == 0 get none at all so zero-hit rows are covered."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    k = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        k.cast("string"),
        F.lit("@example.com from 10."),
        (k % 200).cast("string"),
        F.lit(".0."),
        (k % 250).cast("string"),
        F.lit(" ssn 123-45-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" call 555-010-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    return d.withColumn(
        "pii_text", F.when(k % 5 == 0, F.col("text")).otherwise(injected)
    )


# the same injection in DuckDB SQL, textually identical semantics
_INJECT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN text
            ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
                 || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 || ' ssn 123-45-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' call 555-010-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       END AS pii_text
FROM documents
"""


def _redact_sql(col: str) -> str:
    out = col
    for kind in PII_ORDER:
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '[{kind.upper()}]', 'g')"
    return out


_REDACT_ORACLE = f"""
WITH injected AS ({_INJECT_SQL})
SELECT doc_id,
       CAST(LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["email"]}')) AS INTEGER) AS n_email,
       CAST(LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["ipv4"]}')) AS INTEGER) AS n_ipv4,
       CAST(LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["ssn"]}')) AS INTEGER) AS n_ssn,
       CAST(LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["phone"]}')) AS INTEGER) AS n_phone,
       LENGTH({_redact_sql("pii_text")}) AS redacted_len,
       md5({_redact_sql("pii_text")}) AS redacted_md5
FROM injected
"""


@query("pii_redact_documents", oracle=_REDACT_ORACLE)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection counts + byte-exact redaction
    (md5-verified against DuckDB running the SAME patterns): chained
    JVM regexp_replace, one narrow map, no shuffle, no UDF — at
    100 TB this runs at scan bandwidth alongside the other quality
    gates."""
    d = _with_injected_pii(spark, sf_dir)
    counts = pii_counts(F.col("pii_text"))
    red = redact_pii(F.col("pii_text"))
    return d.select(
        "doc_id",
        *[counts[k].alias(f"n_{k}") for k in PII_ORDER],
        F.length(red).alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


_STATS_ORACLE = f"""
WITH injected AS ({_INJECT_SQL}),
per_doc AS (
  SELECT doc_id,
         LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["email"]}')) AS n_email,
         LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["ipv4"]}')) AS n_ipv4,
         LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["ssn"]}')) AS n_ssn,
         LEN(regexp_extract_all(pii_text, '{PII_PATTERNS["phone"]}')) AS n_phone
  FROM injected
)
SELECT CAST(SUM(n_email) AS BIGINT) AS total_email,
       CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4,
       CAST(SUM(n_ssn) AS BIGINT) AS total_ssn,
       CAST(SUM(n_phone) AS BIGINT) AS total_phone,
       CAST(SUM(CASE WHEN n_email + n_ipv4 + n_ssn + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(COUNT(*) AS BIGINT) AS docs_total
FROM per_doc
"""


@query("pii_corpus_stats", oracle=_STATS_ORACLE)
def pii_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit: per-type totals and how many documents
    carry any PII — the go/no-go number a release review asks for.
    Partial aggregation makes the shuffle O(1) rows; the detection
    itself never leaves the scan stage."""
    d = _with_injected_pii(spark, sf_dir)
    counts = pii_counts(F.col("pii_text"))
    per_doc = d.select(
        *[counts[k].alias(f"n_{k}") for k in PII_ORDER],
    )
    any_pii = sum(F.col(f"n_{k}") for k in PII_ORDER) > 0
    return per_doc.agg(
        *[F.sum(f"n_{k}").alias(f"total_{k}") for k in PII_ORDER],
        F.sum(F.when(any_pii, 1).otherwise(0)).alias("docs_with_pii"),
        F.count(F.lit(1)).alias("docs_total"),
    )
