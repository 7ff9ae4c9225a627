"""Named-table catalog over COW paths (r10 punch #4 + #8): the
reference addresses every table by a two-level name
(``pipeline.py:235`` builds ``f'"{source}"."{table_name}"'``); the
gate now resolves registered names in every verb, plus SHOW TABLES /
DESCRIBE TABLE discovery."""

from __future__ import annotations

import pytest

from data_warehouse_solution_spark import catalog
from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql

from .conftest import SF_ORACLE


@pytest.fixture()
def cat_dir(spark, tmp_path):
    """Point the catalog at a per-test scratch dir and restore after —
    the conf is session-global, so tests must not leak entries into
    the default warehouse catalog."""
    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    d = str(tmp_path / "_catalog")
    spark.conf.set("spark.dws.cow.catalogDir", d)
    yield d
    if old is None:
        spark.conf.unset("spark.dws.cow.catalogDir")
    else:
        spark.conf.set("spark.dws.cow.catalogDir", old)


# ---------------------------------------------------------------- unit


def test_normalize_name_cases():
    assert catalog.normalize_name("Sales") == "sales"
    assert catalog.normalize_name("lake.Orders") == "lake.orders"
    assert catalog.normalize_name('`lake`."Orders"') == "lake.orders"
    for bad in ("a.b.c", "has space", "/tmp/x", "1leading", "a..b", ""):
        with pytest.raises(ValueError):
            catalog.normalize_name(bad)


def test_is_name_vs_path():
    assert catalog.is_name("t1")
    assert catalog.is_name("lake.t1")
    assert not catalog.is_name("/tmp/t1")
    assert not catalog.is_name("cow.`/tmp/t1`")
    assert not catalog.is_name("`/tmp/t1`")
    assert not catalog.is_name("a.b.c")


def test_register_resolve_unregister(spark, cat_dir, tmp_path):
    p = str(tmp_path / "t_reg")
    cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
    catalog.register(spark, "Lake.T1", p)
    assert catalog.resolve(spark, "lake.t1") == p
    assert catalog.resolve(spark, "LAKE.T1") == p  # case-insensitive
    assert catalog.resolve(spark, "nope") is None
    assert catalog.tables(spark) == {"lake.t1": p}
    # duplicate refuses; replace overwrites
    with pytest.raises(ValueError, match="already registered"):
        catalog.register(spark, "lake.t1", "/elsewhere")
    catalog.register(spark, "lake.t1", p, replace=True)
    assert catalog.unregister(spark, "lake.t1") is True
    assert catalog.unregister(spark, "lake.t1") is False  # if_exists
    with pytest.raises(ValueError, match="unknown table name"):
        catalog.unregister(spark, "lake.t1", if_exists=False)
    with pytest.raises(ValueError, match="registered tables"):
        catalog.resolve_or_raise(spark, "lake.t1")


# ------------------------------------------------------ gate lifecycle


def test_named_table_full_sql_lifecycle(spark, cat_dir, tmp_path):
    """Every gate verb by NAME only: CREATE ... LOCATION ... AS ->
    INSERT -> UPDATE -> DELETE -> MERGE -> SELECT (+ time travel +
    metadata suffix) -> DESCRIBE -> SHOW -> OPTIMIZE -> RESTORE ->
    DROP. The name is the only table reference in the SQL text."""
    loc = str(tmp_path / "named_orders")
    snap = run_sql(
        spark,
        f"CREATE TABLE lake.orders_t USING cow PARTITIONED BY (o_orderstatus) "
        f"LOCATION '{loc}' AS "
        "SELECT o_orderkey, o_orderstatus, o_totalprice "
        f"FROM parquet.`{SF_ORACLE}/orders.parquet` WHERE o_orderkey <= 2000",
    ).collect()[0]["snapshot_id"]
    assert snap == 1 and catalog.resolve(spark, "lake.orders_t") == loc
    n0 = run_sql(spark, "SELECT COUNT(*) AS n FROM lake.orders_t").first().n
    run_sql(
        spark,
        "INSERT INTO lake.orders_t VALUES (CAST(-1 AS BIGINT), 'Z', 1.0)",
    )
    run_sql(
        spark,
        "UPDATE lake.orders_t SET o_totalprice = 2.0 WHERE o_orderkey = -1",
    )
    got = run_sql(
        spark,
        "SELECT o_totalprice FROM lake.orders_t WHERE o_orderkey = -1",
    ).first()[0]
    assert got == 2.0
    run_sql(
        spark,
        "MERGE INTO lake.orders_t t "
        "USING (SELECT CAST(-1 AS BIGINT) AS o_orderkey) s "
        "ON t.o_orderkey = s.o_orderkey WHEN MATCHED THEN DELETE",
    )
    assert (
        run_sql(spark, "SELECT COUNT(*) AS n FROM lake.orders_t").first().n == n0
    )
    # time travel + metadata suffix by name
    v1 = run_sql(
        spark, "SELECT COUNT(*) AS n FROM lake.orders_t VERSION AS OF 1"
    ).first().n
    assert v1 == n0
    files = run_sql(spark, "SELECT * FROM lake.orders_t.files").count()
    assert files >= 1
    hist = [
        r["operation"]
        for r in run_sql(spark, "DESCRIBE HISTORY lake.orders_t").collect()
    ]
    assert hist[:4] == ["create", "append", "update", "merge"]
    # discovery verbs
    shown = {
        (r["name"], r["path"]) for r in run_sql(spark, "SHOW TABLES").collect()
    }
    assert ("lake.orders_t", loc) in shown
    desc = {r["col_name"]: r["data_type"] for r in
            run_sql(spark, "DESCRIBE TABLE lake.orders_t").collect()}
    assert desc["o_orderkey"] == "bigint"
    assert desc["# name"] == "lake.orders_t"
    assert desc["# location"] == loc
    assert desc["# partition_by"] == "o_orderstatus"
    # maintenance + restore by name
    run_sql(spark, "OPTIMIZE lake.orders_t")
    run_sql(spark, "RESTORE TABLE lake.orders_t TO VERSION AS OF 1")
    assert (
        run_sql(spark, "SELECT COUNT(*) AS n FROM lake.orders_t").first().n == n0
    )
    # drop removes files AND registration
    run_sql(spark, "DROP TABLE lake.orders_t")
    assert not cow.is_cow_table(spark, loc)
    assert catalog.resolve(spark, "lake.orders_t") is None


def test_create_named_without_location_lands_under_catalog(spark, cat_dir):
    run_sql(
        spark,
        "CREATE TABLE homeless USING cow AS SELECT 1 AS k, 'a' AS v",
    )
    p = catalog.resolve(spark, "homeless")
    assert p == f"{cat_dir}/tables/homeless"
    assert cow.is_cow_table(spark, p)
    assert run_sql(spark, "SELECT k FROM homeless").first().k == 1
    run_sql(spark, "DROP TABLE homeless")


def test_register_existing_table_location_only(spark, cat_dir, tmp_path):
    """LOCATION without AS adopts an EXISTING table: no layout
    clauses allowed (the manifest already fixes them), non-COW paths
    refuse."""
    p = str(tmp_path / "adopted")
    cow.create(spark, p, spark.createDataFrame([(7, "x")], "k long, v string"))
    cow.append(spark, p, spark.createDataFrame([(8, "y")], "k long, v string"))
    run_sql(spark, f"CREATE TABLE adopted_t USING cow LOCATION '{p}'")
    assert run_sql(
        spark, "SELECT COUNT(*) AS n FROM adopted_t"
    ).first().n == 2
    with pytest.raises(ValueError, match="no layout clauses"):
        run_sql(
            spark,
            f"CREATE TABLE bad_t USING cow PARTITIONED BY (v) LOCATION '{p}'",
        )
    with pytest.raises(ValueError, match="not? a COW|no COW"):
        run_sql(
            spark,
            f"CREATE TABLE bad2_t USING cow LOCATION '{tmp_path}/not_a_table'",
        )
    # adopting the same name twice refuses
    with pytest.raises(ValueError, match="already registered"):
        run_sql(spark, f"CREATE TABLE adopted_t USING cow LOCATION '{p}'")
    run_sql(spark, "DROP TABLE adopted_t")
    # DROP of a named table removed the registration too
    assert catalog.resolve(spark, "adopted_t") is None


def test_location_on_path_target_refuses(spark, cat_dir, tmp_path):
    with pytest.raises(ValueError, match="LOCATION requires a table NAME"):
        run_sql(
            spark,
            f"CREATE TABLE `{tmp_path}/p1` USING cow LOCATION '{tmp_path}/p2' "
            "AS SELECT 1 AS k",
        )


def test_unknown_name_errors_list_registered(spark, cat_dir, tmp_path):
    p = str(tmp_path / "known")
    cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
    run_sql(spark, f"CREATE TABLE known_t USING cow LOCATION '{p}'")
    with pytest.raises(ValueError, match="known_t"):
        run_sql(spark, "DESCRIBE TABLE mystery_t")
    run_sql(spark, "DROP TABLE known_t")


def test_name_rewrite_only_in_table_position(spark, cat_dir, tmp_path):
    """A column that shares a registered table's name must not
    rewrite; only FROM/JOIN position does, outside string literals."""
    p = str(tmp_path / "pos")
    cow.create(
        spark, p, spark.createDataFrame([(1, "hit")], "k long, payload string")
    )
    run_sql(spark, f"CREATE TABLE payload USING cow LOCATION '{p}'")
    # `payload` as a COLUMN of another relation: untouched
    spark.createDataFrame([(5, "col")], "k long, payload string") \
        .createOrReplaceTempView("plain_rel")
    r = run_sql(spark, "SELECT payload FROM plain_rel").first()
    assert r["payload"] == "col"
    # `payload` in FROM position: resolves to the COW table
    r2 = run_sql(spark, "SELECT payload FROM payload").first()
    assert r2["payload"] == "hit"
    # inside a string literal: untouched
    r3 = run_sql(spark, "SELECT 'FROM payload' AS s").first()
    assert r3["s"] == "FROM payload"
    # JOIN position resolves too
    r4 = run_sql(
        spark,
        "SELECT p.payload FROM plain_rel r JOIN payload p ON r.k > p.k",
    ).first()
    assert r4["payload"] == "hit"
    spark.catalog.dropTempView("plain_rel")
    run_sql(spark, "DROP TABLE payload")


def test_unregistered_names_fall_through_to_spark(spark, cat_dir):
    """Temp views and native tables keep resolving via Spark when the
    name is not registered — the catalog never shadows them."""
    spark.createDataFrame([(9,)], "k long").createOrReplaceTempView("native_v")
    assert run_sql(spark, "SELECT k FROM native_v").first().k == 9
    spark.catalog.dropTempView("native_v")


def test_show_tables_empty_catalog(spark, cat_dir):
    df = run_sql(spark, "SHOW TABLES")
    assert df.columns == ["name", "path"] and df.count() == 0


def test_describe_table_generated_and_mor_specs(spark, cat_dir, tmp_path):
    """DESCRIBE TABLE surfaces write_mode, generated expressions and
    CHECK constraints from the head manifest."""
    p = str(tmp_path / "desc_full")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1, 2)], "k long, k2 long"),
        write_mode="mor",
        generated_columns={"k2": "k * 2"},
    )
    cow.add_check_constraint(spark, p, "pos_k", "k > 0")
    run_sql(spark, f"CREATE TABLE desc_t USING cow LOCATION '{p}'")
    rows = {r["col_name"]: (r["data_type"], r["info"]) for r in
            run_sql(spark, "DESCRIBE desc_t").collect()}
    assert rows["k2"] == ("bigint", "generated as (k * 2)")
    assert rows["# write_mode"][0] == "mor"
    assert rows["# check: pos_k"][0] == "k > 0"
    run_sql(spark, "DROP TABLE desc_t")


def test_create_or_replace_table(spark, cat_dir, tmp_path):
    """CREATE OR REPLACE: an in-place replace is ONE atomic manifest
    commit (r11 — entirely new files + schema + layout as snapshot
    N+1, old snapshots still readable: Delta's semantics); a LOCATION
    move falls back to stage-and-swap and drops the old location's
    files so a replaced name never orphans; plain CREATE still
    refuses a duplicate, suggesting OR REPLACE."""
    loc1, loc2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    run_sql(
        spark,
        f"CREATE TABLE rep_t USING cow LOCATION '{loc1}' AS SELECT 1 AS k",
    )
    with pytest.raises(ValueError, match="CREATE OR REPLACE"):
        run_sql(
            spark,
            f"CREATE TABLE rep_t USING cow LOCATION '{loc1}' AS SELECT 2 AS k",
        )
    # replace in place, new layout AND schema — history carries
    run_sql(
        spark,
        "CREATE OR REPLACE TABLE rep_t USING cow PARTITIONED BY (st) "
        f"LOCATION '{loc1}' AS SELECT 2 AS k, 'a' AS st",
    )
    assert run_sql(spark, "SELECT k FROM rep_t").first().k == 2
    m2 = cow._load_manifest(spark, loc1, 2)
    assert m2["operation"] == "replace" and m2["partition_by"] == ["st"]
    # time travel CROSSES the replace (pre-replace snapshot readable,
    # old single-column schema intact)
    old = run_sql(spark, "SELECT * FROM rep_t VERSION AS OF 1")
    assert old.columns == ["k"] and old.first().k == 1
    # RESTORE rolls back over the replace; roll forward again after
    run_sql(spark, f"RESTORE TABLE rep_t TO VERSION AS OF 1")
    assert run_sql(spark, "SELECT * FROM rep_t").columns == ["k"]
    run_sql(spark, f"RESTORE TABLE rep_t TO VERSION AS OF 2")
    assert run_sql(spark, "SELECT k FROM rep_t").first().k == 2
    # replace moving the location: old files must not orphan
    run_sql(
        spark,
        f"CREATE OR REPLACE TABLE rep_t USING cow LOCATION '{loc2}' "
        "AS SELECT 3 AS k",
    )
    assert run_sql(spark, "SELECT k FROM rep_t").first().k == 3
    assert not cow.is_cow_table(spark, loc1)
    assert catalog.resolve(spark, "rep_t") == loc2
    # OR REPLACE without AS on a registered name refuses (would dangle)
    with pytest.raises(ValueError, match="AS <query>"):
        run_sql(
            spark,
            f"CREATE OR REPLACE TABLE rep_t USING cow LOCATION '{loc2}'",
        )
    # path-target OR REPLACE also replaces in place
    p = str(tmp_path / "p_rep")
    run_sql(spark, f"CREATE TABLE `{p}` USING cow AS SELECT 1 AS k")
    run_sql(spark, f"CREATE OR REPLACE TABLE `{p}` USING cow AS SELECT 9 AS k")
    assert run_sql(spark, f"SELECT k FROM cow.`{p}`").first().k == 9
    run_sql(spark, "DROP TABLE rep_t")


def test_show_tables_like_pattern(spark, cat_dir, tmp_path):
    """SHOW TABLES LIKE '<pat>' filters with SQL wildcards (% / _),
    case-insensitively."""
    for nm in ("lake.orders", "lake.items", "raw.orders"):
        p = str(tmp_path / nm.replace(".", "_"))
        cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
        run_sql(spark, f"CREATE TABLE {nm} USING cow LOCATION '{p}'")
    names = lambda q: {r["name"] for r in run_sql(spark, q).collect()}
    assert names("SHOW TABLES LIKE 'lake.%'") == {"lake.orders", "lake.items"}
    assert names("SHOW TABLES LIKE '%.orders'") == {"lake.orders", "raw.orders"}
    # case-insensitive, _ matches exactly one char
    assert names("SHOW TABLES LIKE 'LAKE.ORDER_'") == {"lake.orders"}
    assert names("SHOW TABLES LIKE 'lake.order__'") == set()
    assert names("SHOW TABLES LIKE 'nope%'") == set()
    for nm in ("lake.orders", "lake.items", "raw.orders"):
        run_sql(spark, f"DROP TABLE {nm}")


def test_vacuum_dry_run(spark, cat_dir, tmp_path):
    """VACUUM ... DRY RUN returns the itemized reclaim listing (r13,
    Delta parity) without touching files or expiring snapshots; the
    real vacuum then deletes exactly the listed items."""
    p = str(tmp_path / "vac")
    cow.create(spark, p, spark.createDataFrame([(1,), (2,)], "k long"))
    cow.delete(spark, p, "k = 1")  # snapshot 2 rewrites the file
    rows = run_sql(spark, f"VACUUM `{p}` RETAIN 1 SNAPSHOTS DRY RUN").collect()
    assert {r["kind"] for r in rows} <= {"data", "dv", "manifest", "shard",
                                         "bucketview", "bucketview_tmp"}
    # the default age guard hides young files, but the expired
    # snapshot-1 manifest is listed unconditionally
    assert any(r["kind"] == "manifest" and r["name"].endswith("00000001.json")
               for r in rows)
    # dry run touched nothing: time travel to snapshot 1 still works
    assert cow.read(spark, p, snapshot=1).count() == 2
    assert cow.read(spark, p).count() == 1


def test_vacuum_dry_run_lists_exactly_what_real_run_deletes(spark, tmp_path):
    """The r13 pin: the dry-run plan and the real deletion derive from
    ONE planning pass — every listed item is gone after the real run,
    and nothing else under the table's metadata/data dirs vanished."""
    import os

    p = str(tmp_path / "vac2")
    cow.create(
        spark, p, spark.createDataFrame([(i,) for i in range(8)], "k long").repartition(4)
    )
    cow.delete(spark, p, "k < 4")  # rewrites some files
    cow.update(spark, p, "k = 6", {"k": "60"})

    def _walk():
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                if f.startswith("."):
                    continue  # Hadoop .crc sidecars ride their parent
                full = os.path.join(root, f)
                out[os.path.relpath(full, p)] = os.path.getsize(full)
        return out

    before = _walk()
    plan = cow.vacuum_report(spark, p, keep_last=1, min_file_age_seconds=0)
    assert plan, "expected reclaimable items"
    assert before == _walk()  # report deleted nothing
    removed = cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    after = _walk()
    gone = set(before) - set(after)
    planned = set()
    for it in plan:
        if it["kind"] == "data":
            planned.add(os.path.join("data", it["name"]))
        elif it["kind"] == "dv":
            planned.add(os.path.join("_dv", it["name"]))
        elif it["kind"] in ("manifest", "shard"):
            planned.add(os.path.join("_manifests", it["name"]))
    assert gone == planned, (sorted(gone), sorted(planned))
    assert removed == sum(1 for it in plan if it["kind"] in ("data", "dv", "bucketview_tmp"))
    # table content intact: 8 rows minus the 4 deleted, k=6 now 60
    assert sorted(r["k"] for r in cow.read(spark, p).collect()) == [4, 5, 7, 60]


# --------------------------------------------- r11 ADVICE regressions


def test_replace_failure_leaves_old_table_intact(spark, cat_dir, tmp_path):
    """r11 (ADVICE high): a failing CREATE OR REPLACE — malformed or
    unknown TBLPROPERTIES, an unresolvable AS query, a bad layout
    clause — must leave the old table's files, snapshots, AND
    registration untouched (the replacement stages at a temp path and
    swaps in only after the full write succeeds). Before the fix a
    typo'd statement was a data-loss event."""
    loc = str(tmp_path / "keep")
    run_sql(spark, f"CREATE TABLE keep_t USING cow LOCATION '{loc}' AS SELECT 1 AS k")
    run_sql(spark, "INSERT INTO keep_t VALUES (2)")  # snapshot 2

    failing = [
        # malformed TBLPROPERTIES (unquoted entry)
        f"CREATE OR REPLACE TABLE keep_t USING cow "
        f"TBLPROPERTIES (write_mode=mor) LOCATION '{loc}' AS SELECT 9 AS k",
        # unknown property key
        f"CREATE OR REPLACE TABLE keep_t USING cow "
        f"TBLPROPERTIES ('nope'='x') LOCATION '{loc}' AS SELECT 9 AS k",
        # AS query that fails analysis
        f"CREATE OR REPLACE TABLE keep_t USING cow LOCATION '{loc}' "
        "AS SELECT no_such_col FROM range(3)",
        # partition column absent from the payload
        f"CREATE OR REPLACE TABLE keep_t USING cow PARTITIONED BY (ghost) "
        f"LOCATION '{loc}' AS SELECT 9 AS k",
    ]
    for stmt in failing:
        with pytest.raises(Exception):
            run_sql(spark, stmt)
        # old table fully intact: data, history, registration
        assert catalog.resolve(spark, "keep_t") == loc
        assert sorted(r.k for r in run_sql(spark, "SELECT k FROM keep_t").collect()) == [1, 2]
        assert cow.read(spark, loc, snapshot=1).count() == 1  # history survives
    # no staged-replacement debris next to the table
    import os

    leftovers = [d for d in os.listdir(tmp_path) if "__replace-" in d]
    assert leftovers == []
    # and a SUCCEEDING replace still works end-to-end afterwards
    run_sql(
        spark,
        f"CREATE OR REPLACE TABLE keep_t USING cow LOCATION '{loc}' AS SELECT 7 AS k",
    )
    assert run_sql(spark, "SELECT k FROM keep_t").first().k == 7
    run_sql(spark, "DROP TABLE keep_t")


def test_cte_and_temp_view_shadow_registered_name(spark, cat_dir, tmp_path):
    """r11 (ADVICE medium): SQL name precedence is CTE > temp view >
    catalog — a registered COW name must NOT hijack a same-named CTE
    or temp view in a SELECT."""
    p = str(tmp_path / "shadow_t")
    cow.create(spark, p, spark.createDataFrame([(111,)], "k long"))
    catalog.register(spark, "shadowed", p)
    try:
        # CTE wins over the registered name
        got = run_sql(
            spark,
            "WITH shadowed AS (SELECT 222 AS k) SELECT k FROM shadowed",
        ).first()
        assert got.k == 222
        # temp view wins over the registered name
        spark.createDataFrame([(333,)], "k long").createOrReplaceTempView("shadowed")
        try:
            assert run_sql(spark, "SELECT k FROM shadowed").first().k == 333
        finally:
            spark.catalog.dropTempView("shadowed")
        # with no shadow, the registered name resolves again
        assert run_sql(spark, "SELECT k FROM shadowed").first().k == 111
    finally:
        catalog.unregister(spark, "shadowed")


def test_rewritten_name_keeps_qualification(spark, cat_dir, tmp_path):
    """r11 (ADVICE medium): the rewrite aliases the substituted view
    back to the original name's last segment, so queries qualifying
    columns by the table name (``SELECT t.x FROM t``) still resolve;
    an explicit user alias is respected (no double alias)."""
    p1, p2 = str(tmp_path / "qa"), str(tmp_path / "qb")
    cow.create(spark, p1, spark.createDataFrame([(1, "x")], "k long, v string"))
    cow.create(spark, p2, spark.createDataFrame([(1, 10)], "k long, w long"))
    catalog.register(spark, "lake.qa", p1)
    catalog.register(spark, "qb", p2)
    try:
        # two-level name -> alias is the LAST segment
        assert run_sql(spark, "SELECT qa.v FROM lake.qa").first().v == "x"
        # one-level name, qualified in WHERE and join ON
        row = run_sql(
            spark,
            "SELECT qa.v, qb.w FROM lake.qa JOIN qb ON qa.k = qb.k "
            "WHERE qb.w > 0",
        ).first()
        assert (row.v, row.w) == ("x", 10)
        # explicit user aliases still work (no appended alias collision)
        row = run_sql(
            spark,
            "SELECT a.v, b.w FROM lake.qa AS a JOIN qb b ON a.k = b.k",
        ).first()
        assert (row.v, row.w) == ("x", 10)
    finally:
        catalog.unregister(spark, "lake.qa")
        catalog.unregister(spark, "qb")


def test_replace_cdc_and_vacuum(spark, cat_dir, tmp_path):
    """The replace-as-commit claims, pinned: the CDC feed streams a
    replace as full delete+insert, and VACUUM ages out the
    pre-replace files (after which time travel to them refuses
    cleanly while the replaced state reads fine)."""
    p = str(tmp_path / "rcv")
    run_sql(spark, f"CREATE TABLE `{p}` USING cow AS SELECT id AS k FROM range(4)")
    run_sql(
        spark,
        f"CREATE OR REPLACE TABLE `{p}` USING cow AS "
        "SELECT id + 100 AS k FROM range(2)",
    )
    ch = cow.changes(spark, p, from_snapshot=1).collect()
    got = sorted((r["k"], r["_change_type"]) for r in ch)
    assert got == [(0, "delete"), (1, "delete"), (2, "delete"), (3, "delete"),
                   (100, "insert"), (101, "insert")]
    # vacuum drops the pre-replace files; current state unaffected
    removed = cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    assert removed >= 1
    assert sorted(r.k for r in cow.read(spark, p).collect()) == [100, 101]
    with pytest.raises(Exception):
        cow.read(spark, p, snapshot=1).collect()


def test_replace_with_location_move_failure_keeps_old(spark, cat_dir, tmp_path):
    """The stage-and-swap branch (LOCATION moves the table) has the
    same failure atomicity as the in-place commit: a failing payload
    aborts with the OLD location's table and the registration
    untouched, and nothing staged at the new location."""
    import os

    loc1, loc2 = str(tmp_path / "mv1"), str(tmp_path / "mv2")
    run_sql(spark, f"CREATE TABLE mv_t USING cow LOCATION '{loc1}' AS SELECT 1 AS k")
    with pytest.raises(Exception):
        run_sql(
            spark,
            f"CREATE OR REPLACE TABLE mv_t USING cow LOCATION '{loc2}' "
            "AS SELECT no_such FROM range(2)",
        )
    assert catalog.resolve(spark, "mv_t") == loc1
    assert run_sql(spark, "SELECT k FROM mv_t").first().k == 1
    assert not cow.is_cow_table(spark, loc2)
    assert not [d for d in os.listdir(tmp_path) if "__replace-" in d]
    # a succeeding move: new location live, old files gone, no orphans
    run_sql(
        spark,
        f"CREATE OR REPLACE TABLE mv_t USING cow LOCATION '{loc2}' AS SELECT 9 AS k",
    )
    assert catalog.resolve(spark, "mv_t") == loc2
    assert run_sql(spark, "SELECT k FROM mv_t").first().k == 9
    assert not cow.is_cow_table(spark, loc1)
    run_sql(spark, "DROP TABLE mv_t")
