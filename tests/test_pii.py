"""PII scrub: Spark (Java regex) and DuckDB (RE2) must agree on the
pattern set byte-for-byte — the patterns are deliberately restricted
to the RE2-safe subset, and this test feeds both engines hostile
strings (adjacent matches, boundary digits, near-misses) beyond what
the fixture corpus exercises."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from data_warehouse_solution_spark.operators.pii import (
    PII_ORDER,
    PII_PATTERNS,
    _redact_sql,
    pii_counts,
    redact_pii,
)

HOSTILE = [
    "a@b.co",                                    # minimal email
    "x a@b.co y c@d.org z",                      # two emails
    "ip 10.0.0.1.2 tail",                        # 5 dotted groups: \b still hits first quad
    "9999.1.2.3",                                # 4-digit first octet: no \b match at start
    "123-45-6789",                               # bare ssn
    "123-456-7890 and 123-45-6789",              # phone then ssn, adjacent types
    "555.010.1234",                              # dotted phone form
    "55-010-1234",                               # 2-digit lead: no match
    "a@b.co123-45-6789",                         # email glued to ssn digits
    "(1.2.3.4)(5.6.7.8)",                        # punctuation-delimited quads
    "email@10.0.0.1.com then 10.0.0.1",          # quad inside an email domain
    "",                                          # empty
]


def test_redaction_and_counts_match_duckdb(spark):
    sdf = (
        spark.createDataFrame([(i, s) for i, s in enumerate(HOSTILE)], "i int, t string")
        .select(
            "i",
            redact_pii(F.col("t")).alias("red"),
            *[pii_counts(F.col("t"))[k].alias(f"n_{k}") for k in PII_ORDER],
        )
        .collect()
    )
    con = duckdb.connect()
    counts_sql = ", ".join(
        f"CAST(LEN(regexp_extract_all(t, '{PII_PATTERNS[k]}')) AS INTEGER) AS n_{k}"
        for k in PII_ORDER
    )
    for row in sorted(sdf, key=lambda r: r["i"]):
        got = con.execute(
            f"SELECT {_redact_sql('t')} AS red, {counts_sql} FROM (SELECT ? AS t)",
            [HOSTILE[row["i"]]],
        ).fetchone()
        assert row["red"] == got[0], f"case {row['i']}: {row['red']!r} != {got[0]!r}"
        for j, k in enumerate(PII_ORDER):
            assert row[f"n_{k}"] == got[1 + j], f"case {row['i']} count {k}"


def test_redact_null_propagates(spark):
    out = spark.createDataFrame([(None,)], "t string").select(
        redact_pii(F.col("t")).alias("red")
    ).collect()
    assert out[0]["red"] is None
