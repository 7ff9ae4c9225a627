"""SQL entry point with the reference's statement-verb whitelist
(operator A7, ``pipeline.py:110-114``).

The reference filtered generated SQL text down to
CREATE/INSERT/DELETE/UPDATE/DROP/ALTER/TRUNCATE/SELECT/VALUES before
shipping it to the warehouse. Our engine's equivalent gate sits in
front of ``spark.sql``: the Spark parser is the real security
boundary, but the verb whitelist preserves the reference's contract
(reject e.g. SET/RESET/EXPLAIN submitted through the load path) and
fails fast with a clear error instead of a parse attempt.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# pipeline.py:110-114, plus WITH (CTE prologue of a SELECT)
ALLOWED_VERBS = (
    "CREATE",
    "INSERT",
    "DELETE",
    "UPDATE",
    "DROP",
    "ALTER",
    "TRUNCATE",
    "SELECT",
    "VALUES",
    "WITH",
)

_VERB_RE = re.compile(r"^\s*([A-Za-z]+)")


def filter_sql_commands(commands: list[str]) -> list[str]:
    """Keep only whitelisted statements (reference behavior: silently
    drop everything else, ``pipeline.py:110-114``)."""
    out = []
    for cmd in commands:
        m = _VERB_RE.match(cmd or "")
        if m and m.group(1).upper() in ALLOWED_VERBS:
            out.append(cmd)
    return out


def run_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Execute one whitelisted statement via Spark SQL; raise
    ValueError (not a parse error) for non-whitelisted verbs."""
    m = _VERB_RE.match(statement or "")
    verb = m.group(1).upper() if m else ""
    if verb not in ALLOWED_VERBS:
        raise ValueError(
            f"statement verb {verb or '<empty>'!r} is not in the allowed set {ALLOWED_VERBS}"
        )
    return spark.sql(statement)
