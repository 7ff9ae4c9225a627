"""Seeded differential fuzzing: randomly generated filter/projection
and aggregation queries executed by Spark AND DuckDB over the same
parquet, results compared as multisets.

This is a miniature SQLsmith aimed at the common ANSI subset: the
grammar only emits constructs whose semantics are identical in both
engines (comparisons, BETWEEN, IN, LIKE, AND/OR/NOT on
numeric/string/timestamp columns; COUNT/MIN/MAX/decimal-SUM
aggregates). Seeds are fixed, so failures reproduce exactly.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import rows_multiset

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STRING_COLS = ["l_returnflag", "l_linestatus"]
TS_COL = "l_shipdate"
STRING_VALUES = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_suppkey"]


def _rand_predicate(rng: random.Random, depth: int = 0) -> str:
    choice = rng.randrange(8 if depth < 2 else 6)
    if choice == 0:
        col = rng.choice(NUMERIC_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        val = round(rng.uniform(0, 60000 if col == "l_extendedprice" else 50), 2)
        return f"{col} {op} {val}"
    if choice == 1:
        col = rng.choice(KEY_COLS)
        lo = rng.randrange(0, 5000)
        return f"{col} BETWEEN {lo} AND {lo + rng.randrange(1, 3000)}"
    if choice == 2:
        col = rng.choice(STRING_COLS)
        vals = rng.sample(STRING_VALUES[col], rng.randrange(1, len(STRING_VALUES[col]) + 1))
        inlist = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({inlist})"
    if choice == 3:
        col = rng.choice(STRING_COLS)
        return f"{col} LIKE '{rng.choice(['A%', '%O%', 'N%', '_'])}'"
    if choice == 4:
        year = rng.randrange(1995, 2002)
        return f"{TS_COL} < TIMESTAMP '{year}-0{rng.randrange(1, 9)}-15 00:00:00'"
    if choice == 5:
        col = rng.choice(KEY_COLS)
        return f"{col} % {rng.randrange(2, 13)} = {rng.randrange(0, 2)}"
    if choice == 6:
        a = _rand_predicate(rng, depth + 1)
        b = _rand_predicate(rng, depth + 1)
        return f"(({a}) {rng.choice(['AND', 'OR'])} ({b}))"
    return f"(NOT ({_rand_predicate(rng, depth + 1)}))"


def _compare(spark, spark_df, oracle_sql: str, tag: str) -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/lineitem.parquet')"
        )
        cur = con.execute(oracle_sql)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(d_cols), tag
    assert rows_multiset(s_cols, s_rows) == rows_multiset(d_cols, d_rows), (
        f"{tag}: engines disagree ({len(s_rows)} vs {len(d_rows)} rows)"
    )


@pytest.mark.parametrize("seed", range(35))
def test_fuzz_filter_projection(spark, seed):
    rng = random.Random(1000 + seed)
    pred = _rand_predicate(rng)
    cols = ["l_orderkey", "l_linenumber"] + rng.sample(NUMERIC_COLS + STRING_COLS, 2)
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    sdf = li.filter(F.expr(pred)).select(*cols)
    sql = f"SELECT {', '.join(cols)} FROM lineitem WHERE {pred}"
    _compare(spark, sdf, sql, f"seed={seed} pred={pred}")


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_aggregate(spark, seed):
    rng = random.Random(2000 + seed)
    pred = _rand_predicate(rng)
    groups = rng.sample(GROUP_COLS, rng.randrange(1, 3))
    money = rng.choice(["l_extendedprice", "l_quantity"])
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    sdf = (
        li.filter(F.expr(pred))
        .groupBy(*groups)
        .agg(
            F.count("*").alias("n"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.sum(F.col(money).cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    sql = f"""
        SELECT {", ".join(groups)}, COUNT(*) AS n,
               MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
               CAST(SUM(CAST({money} AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem WHERE {pred}
        GROUP BY {", ".join(groups)}
    """
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} groups={groups}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_having_ordered_limit(spark, seed):
    """HAVING + deterministic ORDER BY/LIMIT, order materialized as a
    rank column so the multiset compare observes it."""
    rng = random.Random(3000 + seed)
    pred = _rand_predicate(rng)
    group = rng.choice(GROUP_COLS)
    min_n = rng.randrange(2, 60)
    limit = rng.randrange(3, 12)
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    from pyspark.sql import Window

    agg = (
        li.filter(F.expr(pred))
        .groupBy(group)
        .agg(F.count("*").alias("n"), F.min("l_orderkey").alias("min_key"))
        .filter(F.col("n") >= min_n)
    )
    w = Window.orderBy(F.col("n").desc(), F.col(group))
    sdf = agg.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= limit)
    sql = f"""
        WITH agg AS (
          SELECT {group}, COUNT(*) AS n, MIN(l_orderkey) AS min_key
          FROM lineitem WHERE {pred}
          GROUP BY {group} HAVING COUNT(*) >= {min_n}
        )
        SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, {group}) AS rnk FROM agg
        QUALIFY rnk <= {limit}
    """
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} group={group}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_date_extraction_groups(spark, seed):
    rng = random.Random(4000 + seed)
    pred = _rand_predicate(rng)
    part = rng.choice(["YEAR", "MONTH", "QUARTER"])
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    extract = {"YEAR": F.year, "MONTH": F.month, "QUARTER": F.quarter}[part]
    sdf = (
        li.filter(F.expr(pred))
        .groupBy(extract("l_shipdate").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
        )
    )
    sql = f"""
        SELECT {part}(l_shipdate) AS bucket, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem WHERE {pred}
        GROUP BY 1
    """
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} part={part}")


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_join(spark, seed):
    """Randomized lineitem-orders equi-joins with per-side filters and
    a random join type."""
    rng = random.Random(5000 + seed)
    pred = _rand_predicate(rng)
    o_year = rng.randrange(1995, 2001)
    how, sql_how = rng.choice(
        [("inner", "JOIN"), ("left", "LEFT JOIN"), ("right", "RIGHT JOIN")]
    )
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
        F.expr(f"YEAR(o_orderdate) = {o_year}")
    )
    sdf = (
        li.filter(F.expr(pred))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), how)
        .select("l_orderkey", "l_linenumber", "o_orderkey", "o_orderstatus")
    )
    sql = f"""
        SELECT l_orderkey, l_linenumber, o_orderkey, o_orderstatus
        FROM (SELECT * FROM lineitem WHERE {pred}) l
        {sql_how} (SELECT * FROM orders WHERE YEAR(o_orderdate) = {o_year}) o
          ON l.l_orderkey = o.o_orderkey
    """
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_ORACLE}/lineitem.parquet')"
        )
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_ORACLE}/orders.parquet')"
        )
        cur = con.execute(sql)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    assert sorted(s_cols) == sorted(d_cols)
    assert rows_multiset(s_cols, s_rows) == rows_multiset(d_cols, d_rows), (
        f"seed={seed} how={how} pred={pred}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_window_functions(spark, seed):
    """Random ranking/analytic/frame window over a unique order chain
    (l_extendedprice, l_orderkey, l_linenumber) — ties impossible, so
    every function is deterministic in both engines."""
    rng = random.Random(5000 + seed)
    pred = _rand_predicate(rng)
    part = rng.choice(GROUP_COLS)
    kind = rng.choice(["row_number", "rank", "lag", "cumsum"])
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    from pyspark.sql import Window

    order_sql = "l_extendedprice, l_orderkey, l_linenumber"
    w = Window.partitionBy(part).orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    base = li.filter(F.expr(pred))
    if kind == "row_number":
        col, sql_expr = F.row_number().over(w), f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif kind == "rank":
        col, sql_expr = F.rank().over(w), f"RANK() OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif kind == "lag":
        col, sql_expr = (
            F.lag("l_orderkey", 1).over(w),
            f"LAG(l_orderkey, 1) OVER (PARTITION BY {part} ORDER BY {order_sql})",
        )
    else:
        cum = Window.partitionBy(part).orderBy(
            "l_extendedprice", "l_orderkey", "l_linenumber"
        ).rowsBetween(Window.unboundedPreceding, 0)
        col = F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(cum).cast("double")
        sql_expr = (
            f"CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER "
            f"(PARTITION BY {part} ORDER BY {order_sql} ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
        )
    sdf = base.select("l_orderkey", "l_linenumber", col.alias("wval"))
    sql = f"""
        SELECT l_orderkey, l_linenumber, {sql_expr} AS wval
        FROM lineitem WHERE {pred}
    """
    _compare(spark, sdf, sql, f"seed={seed} kind={kind} part={part} pred={pred}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_setops(spark, seed):
    """Random UNION ALL / INTERSECT / EXCEPT between two filtered key
    projections (both engines use distinct semantics for
    INTERSECT/EXCEPT and keep duplicates under UNION ALL)."""
    rng = random.Random(6000 + seed)
    pred_a = _rand_predicate(rng)
    pred_b = _rand_predicate(rng)
    op = rng.choice(["UNION ALL", "INTERSECT", "EXCEPT"])
    cols = ["l_orderkey", "l_linenumber"]
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    a = li.filter(F.expr(pred_a)).select(*cols)
    b = li.filter(F.expr(pred_b)).select(*cols)
    sdf = {"UNION ALL": a.unionAll(b), "INTERSECT": a.intersect(b), "EXCEPT": a.exceptAll(b)}[op]
    if op == "EXCEPT":
        # Spark exceptAll is multiset difference; DuckDB EXCEPT is
        # distinct — use EXCEPT ALL to match multiset semantics
        sql = f"SELECT {', '.join(cols)} FROM lineitem WHERE {pred_a} EXCEPT ALL SELECT {', '.join(cols)} FROM lineitem WHERE {pred_b}"
    else:
        sql = f"SELECT {', '.join(cols)} FROM lineitem WHERE {pred_a} {op} SELECT {', '.join(cols)} FROM lineitem WHERE {pred_b}"
    _compare(spark, sdf, sql, f"seed={seed} op={op}")


def _rand_scalar_expr(rng: random.Random, depth: int = 0, family: str | None = None) -> str:
    """Random scalar expression whose SQL text parses AND evaluates
    identically in Spark and DuckDB. Constrained to the shared-exact
    subset: integer +,-,* (values bounded far below int64 overflow so
    ANSI mode never trips), per-row float arithmetic (bit-exact: same
    IEEE ops in the same order — no ROUND, whose tie-breaking
    differs), CASE/ABS/GREATEST/LEAST, COALESCE(NULLIF(...)) for null
    propagation, and 1-based SUBSTR/UPPER/LOWER/LENGTH on non-null
    string columns (CONCAT is excluded: DuckDB skips NULL args where
    Spark returns NULL)."""
    family = family or rng.choice(["num", "str"])
    if family == "str":
        # string family: string functions, plus a string-typed CASE
        # (both branches string) at shallow depth
        col = rng.choice(STRING_COLS)
        base = rng.choice(
            [
                f"UPPER({col})",
                f"LOWER({col})",
                f"SUBSTR({col}, 1, {rng.randrange(1, 3)})",
            ]
        )
        if depth < 2 and rng.randrange(3) == 0:
            other = _rand_scalar_expr(rng, depth + 1, "str")
            return f"(CASE WHEN {_rand_predicate(rng, 2)} THEN {base} ELSE {other} END)"
        return base
    kind = rng.randrange(7 if depth < 2 else 5)
    if kind == 0:
        a, b = rng.choice(KEY_COLS), rng.choice(KEY_COLS)
        op = rng.choice(["+", "-", "*"])
        return f"({a} {op} ({b} % {rng.randrange(3, 50)}))"
    if kind == 1:
        col = rng.choice(NUMERIC_COLS)
        lit = round(rng.uniform(-5, 5), 3)
        return f"({col} {rng.choice(['+', '-', '*'])} {lit})"
    if kind == 2:
        return f"ABS({rng.choice(KEY_COLS)} - {rng.randrange(0, 4000)})"
    if kind == 3:
        fn = rng.choice(["GREATEST", "LEAST"])
        return f"{fn}({rng.choice(KEY_COLS)}, {rng.randrange(0, 3000)}, {rng.choice(KEY_COLS)})"
    if kind == 4:
        mod = rng.randrange(2, 9)
        return (
            f"COALESCE(NULLIF({rng.choice(KEY_COLS)} % {mod}, {rng.randrange(0, mod)}),"
            f" {rng.randrange(-99, 0)})"
        )
    if kind == 5:
        # both CASE branches stay in the numeric family we are in —
        # mixed-family branches diverge (Spark casts string->bigint at
        # runtime, DuckDB refuses to bind)
        inner = _rand_scalar_expr(rng, depth + 1, "num")
        other = _rand_scalar_expr(rng, depth + 1, "num")
        return f"(CASE WHEN {_rand_predicate(rng, 2)} THEN {inner} ELSE {other} END)"
    return f"LENGTH({rng.choice(STRING_COLS)})"


# strings chosen to break naive statement splitting: SQL keywords,
# separators, and operators INSIDE quoted literals (no embedded quotes
# — literal-escape syntax differs between the engines)
_HOSTILE_NOTES = [
    "plain",
    "x WHERE y",
    "a AND b",
    "p, q = 3",
    "OR 1 = 1",
    "it WHERE x AND y, z",
    "SET k = 9",
    "(WHERE)",
]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cow_dml_hostile_literals(spark, tmp_path, seed):
    """Round-trips randomized DELETE/UPDATE/INSERT text whose literals
    contain WHERE/AND/SET/commas against a COW table via run_sql AND
    against DuckDB executing the identical statements on a real
    table; contents must agree after EVERY statement. This is the
    adversarial family for the quote-aware statement scanner — the
    round-4 regex split mis-parsed exactly these shapes."""
    import duckdb as _duckdb

    from data_warehouse_solution_spark import cowtable as cow
    from data_warehouse_solution_spark.sql_gate import run_sql

    rng = random.Random(7000 + seed)
    rows = [
        (i, rng.choice(_HOSTILE_NOTES), float(rng.randrange(0, 100)))
        for i in range(150)
    ]
    path = str(tmp_path / f"fuzz_dml_{seed}")
    cow.create(spark, path, spark.createDataFrame(rows, "k long, note string, price double"))
    con = _duckdb.connect()
    try:
        con.execute("CREATE TABLE t (k BIGINT, note VARCHAR, price DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        next_key = 1000
        for step in range(4):
            lit = rng.choice(_HOSTILE_NOTES)
            cond = rng.choice(
                [
                    f"note = '{lit}'",
                    f"k % {rng.randrange(3, 9)} = {rng.randrange(0, 3)} AND note = '{lit}'",
                    f"(k < {rng.randrange(20, 120)} OR note = '{lit}')",
                ]
            )
            kind = rng.choice(["delete", "update", "insert"])
            if kind == "delete":
                stmt = f"DELETE FROM `{path}` WHERE {cond}"
                con.execute(f"DELETE FROM t WHERE {cond}")
            elif kind == "update":
                lit2 = rng.choice(_HOSTILE_NOTES)
                stmt = (
                    f"UPDATE `{path}` SET note = '{lit2}', price = price + 1 WHERE {cond}"
                )
                con.execute(f"UPDATE t SET note = '{lit2}', price = price + 1 WHERE {cond}")
            else:
                next_key += 1
                stmt = f"INSERT INTO `{path}` VALUES ({next_key}, '{lit}', 7.5)"
                con.execute(f"INSERT INTO t VALUES ({next_key}, '{lit}', 7.5)")
            run_sql(spark, stmt)
            s_rows = sorted(tuple(r) for r in cow.read(spark, path).collect())
            d_rows = sorted(tuple(r) for r in con.execute("SELECT k, note, price FROM t").fetchall())
            assert s_rows == d_rows, f"seed={seed} step={step} stmt={stmt}"
    finally:
        con.close()


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_scalar_expressions(spark, seed):
    """Per-row scalar semantics: the same expression TEXT evaluated by
    both engines over the same rows must agree exactly — integer
    arithmetic, null propagation through NULLIF/COALESCE, CASE
    branching, and string functions are where engines quietly
    diverge."""
    rng = random.Random(5000 + seed)
    pred = _rand_predicate(rng)
    exprs = [_rand_scalar_expr(rng) for _ in range(3)]
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs))
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    sdf = li.filter(F.expr(pred)).selectExpr(
        "l_orderkey", "l_linenumber", *[f"{e} AS e{i}" for i, e in enumerate(exprs)]
    )
    sql = f"SELECT l_orderkey, l_linenumber, {sel} FROM lineitem WHERE {pred}"
    _compare(spark, sdf, sql, f"seed={seed} exprs={exprs}")


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_qualify_same_text_both_engines(spark, seed):
    """QUALIFY fuzz: the IDENTICAL statement text runs on DuckDB
    (native QUALIFY) and on Spark through the gate's rewrite
    (``sql_gate._run_qualify``) — both the wrap form (predicate on
    the rank alias) and the inject form (inline window over an input
    column the projection keeps) are exercised; ranking windows order
    by a unique key chain so row_number is deterministic."""
    from data_warehouse_solution_spark.sql_gate import run_sql

    rng = random.Random(9000 + seed)
    pred = _rand_predicate(rng)
    group = rng.choice(STRING_COLS + ["l_suppkey"])
    func = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    k = rng.randrange(1, 5)
    over = (
        f"OVER (PARTITION BY {group} "
        f"ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)"
    )
    if seed % 2 == 0:
        sql = f"""
            SELECT {group}, l_orderkey, l_linenumber, {func} {over} AS rn
            FROM lineitem WHERE {pred}
            QUALIFY rn <= {k}
        """
    else:
        sql = f"""
            SELECT {group}, l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem WHERE {pred}
            QUALIFY {func} {over} <= {k}
        """
    spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = run_sql(spark, sql)
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} group={group} func={func} k={k}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_qualify_setops_and_distinct(spark, seed):
    """r7 punch-list #7 fuzz: QUALIFY under SELECT DISTINCT and inside
    UNION [ALL] / INTERSECT / EXCEPT branches — the IDENTICAL text on
    DuckDB (native) and through the gate's per-branch rewrite. Even
    seeds: DISTINCT + QUALIFY (the filter runs BEFORE dedup); odd
    seeds: a set op whose branches carry their own QUALIFY, with a
    whole-expression ORDER/LIMIT left outside the branch rewrites."""
    from data_warehouse_solution_spark.sql_gate import run_sql

    rng = random.Random(13000 + seed)
    pred = _rand_predicate(rng)
    group = rng.choice(STRING_COLS + ["l_suppkey"])
    func = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    k = rng.randrange(1, 5)
    over = (
        f"OVER (PARTITION BY {group} "
        f"ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)"
    )
    if seed % 2 == 0:
        sql = f"""
            SELECT DISTINCT {group}, l_suppkey
            FROM lineitem WHERE {pred}
            QUALIFY {func} {over} <= {k}
        """
    else:
        setop = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        over2 = (
            f"OVER (PARTITION BY {group} "
            f"ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber)"
        )
        sql = f"""
            SELECT {group}, l_orderkey, l_linenumber FROM lineitem WHERE {pred}
            QUALIFY {func} {over} <= {k}
            {setop}
            SELECT {group}, l_orderkey, l_linenumber FROM lineitem
            QUALIFY {func} {over2} <= {k}
        """
    spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = run_sql(spark, sql)
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} group={group} func={func} k={k}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_qualify_inside_cte(spark, seed):
    """CTE-nested QUALIFY fuzz (the r6 punch-list scope gap): the
    IDENTICAL statement text — a WITH whose body carries QUALIFY,
    consumed by an aggregating final SELECT (and, on odd seeds, a
    second QUALIFY on the final block) — runs on DuckDB natively and
    on Spark through the gate's per-block rewrite."""
    from data_warehouse_solution_spark.sql_gate import run_sql

    rng = random.Random(11000 + seed)
    pred = _rand_predicate(rng)
    group = rng.choice(STRING_COLS + ["l_suppkey"])
    func = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    k = rng.randrange(1, 5)
    over = (
        f"OVER (PARTITION BY {group} "
        f"ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)"
    )
    final_tail = (
        "QUALIFY RANK() OVER (ORDER BY total DESC, " + group + ") <= 2"
        if seed % 2
        else ""
    )
    sql = f"""
        WITH topk AS (
            SELECT {group}, l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem WHERE {pred}
            QUALIFY {func} {over} <= {k}
        )
        SELECT {group}, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM topk GROUP BY {group}
        {final_tail}
    """
    spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = run_sql(spark, sql)
    _compare(spark, sdf, sql, f"seed={seed} pred={pred} group={group} func={func} k={k}")
