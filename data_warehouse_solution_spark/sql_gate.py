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


_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(`[^`]+`|\S+)\s+ADD\s+COLUMNS?\s*\(?\s*(\w+)\s+([\w()<>,\s]+?)\s*\)?\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(`[^`]+`|\S+)\s+DROP\s+COLUMNS?\s*\(?\s*(\w+)\s*\)?\s*$",
    re.IGNORECASE,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(`[^`]+`|\S+)\s+WHERE\s+(.+)$", re.IGNORECASE | re.DOTALL
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(`[^`]+`|\S+)\s+SET\s+(.+?)\s+WHERE\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(set_clause: str) -> dict[str, str]:
    """SET a = e1, b = e2 -> {a: e1, b: e2}; commas inside quoted
    literals or parenthesized call arguments do not split."""
    parts, buf, in_quote, depth = [], [], False, 0
    for ch in set_clause:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote and ch == "(":
            depth += 1
        elif not in_quote and ch == ")":
            depth -= 1
        if ch == "," and not in_quote and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    out = {}
    for p in parts:
        col, _, expr = p.partition("=")
        if not _:
            raise ValueError(f"malformed SET assignment: {p!r}")
        out[col.strip()] = expr.strip()
    return out


def _unquote(target: str) -> str:
    return target[1:-1] if target.startswith("`") and target.endswith("`") else target


def run_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Execute one whitelisted statement; raise ValueError (not a
    parse error) for non-whitelisted verbs.

    DELETE/UPDATE whose target is a copy-on-write snapshot table
    (``cowtable``) execute as real file-level-rewrite commits and
    return the commit stats as a one-row DataFrame (the Delta-style
    DML-metrics result); ALTER TABLE ADD/DROP COLUMN on a COW target
    commits the metadata-only schema change and returns the snapshot
    id. Any other target falls through to ``spark.sql`` — the
    reference whitelisted these verbs (``pipeline.py:110-114``)
    assuming the warehouse executes them; this engine now does."""
    m = _VERB_RE.match(statement or "")
    verb = m.group(1).upper() if m else ""
    if verb not in ALLOWED_VERBS:
        raise ValueError(
            f"statement verb {verb or '<empty>'!r} is not in the allowed set {ALLOWED_VERBS}"
        )
    if verb == "ALTER":
        from . import cowtable as cow

        am = _ALTER_ADD_RE.match(statement)
        rm = _ALTER_DROP_RE.match(statement)
        target = _unquote((am or rm).group(1)) if (am or rm) else None
        if target and cow._list_snapshots(spark, target):
            if am:
                snap = cow.alter_add_column(spark, target, am.group(2), am.group(3))
            else:
                snap = cow.alter_drop_column(spark, target, rm.group(2))
            return spark.createDataFrame([(snap,)], "snapshot_id long")
    if verb in ("DELETE", "UPDATE"):
        from . import cowtable as cow

        dm = _DELETE_RE.match(statement) if verb == "DELETE" else None
        um = _UPDATE_RE.match(statement) if verb == "UPDATE" else None
        target = _unquote((dm or um).group(1)) if (dm or um) else None
        if target and cow._list_snapshots(spark, target):
            if dm:
                stats = cow.delete(spark, target, dm.group(2).strip())
            else:
                stats = cow.update(
                    spark, target, um.group(3).strip(), _split_assignments(um.group(2))
                )
            return spark.createDataFrame(
                [tuple(stats[k] for k in sorted(stats))],
                ", ".join(f"{k} long" for k in sorted(stats)),
            )
    return spark.sql(statement)
