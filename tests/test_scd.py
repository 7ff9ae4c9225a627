"""APPLY CHANGES (r12): SCD Type 1 and Type 2 CDC ingestion — batch
semantics, out-of-order/stale-batch guards, deletes, cross-batch
version chaining, duplicate-sequence refusal, and exactly-once replay
of the SCD2 version append via the engine txn map."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.operators.scd import (
    apply_changes_scd1,
    apply_changes_scd2,
    scd2_target_schema,
)


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, v string, op string"
    )


def _mk1(spark, path):
    cow.create(
        spark,
        path,
        _feed(spark, []).select("k", "seq", "v", "op").limit(0),
    )
    return path


def test_scd1_upsert_and_delete(spark, tmp_path):
    p = _mk1(spark, str(tmp_path / "t"))
    b1 = _feed(spark, [(1, 10, "a1", "u"), (1, 11, "a2", "u"), (2, 12, "b1", "u")])
    apply_changes_scd1(spark, p, b1, ["k"], "seq", delete_expr="op = 'd'")
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[1]["v"] == "a2" and rows[2]["v"] == "b1"
    b2 = _feed(spark, [(1, 13, "", "d"), (3, 14, "c1", "u")])
    apply_changes_scd1(spark, p, b2, ["k"], "seq", delete_expr="op = 'd'")
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert set(rows) == {2, 3}


def test_scd1_stale_batch_cannot_regress(spark, tmp_path):
    p = _mk1(spark, str(tmp_path / "t"))
    apply_changes_scd1(
        spark, p, _feed(spark, [(1, 20, "new", "u")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    # a late-arriving batch with OLDER sequences must change nothing
    apply_changes_scd1(
        spark, p, _feed(spark, [(1, 5, "old", "u"), (1, 6, "", "d")]),
        ["k"], "seq", delete_expr="op = 'd'",
    )
    rows = cow.read(spark, p).collect()
    assert len(rows) == 1 and rows[0]["v"] == "new" and rows[0]["seq"] == 20


def test_scd1_delete_wins_within_batch_only_if_last(spark, tmp_path):
    p = _mk1(spark, str(tmp_path / "t"))
    # delete mid-batch, then a newer upsert: the upsert wins
    apply_changes_scd1(
        spark, p,
        _feed(spark, [(1, 1, "x", "u"), (1, 2, "", "d"), (1, 3, "y", "u")]),
        ["k"], "seq", delete_expr="op = 'd'",
    )
    rows = cow.read(spark, p).collect()
    assert len(rows) == 1 and rows[0]["v"] == "y"


def test_scd1_never_seen_delete_is_noop(spark, tmp_path):
    p = _mk1(spark, str(tmp_path / "t"))
    apply_changes_scd1(
        spark, p, _feed(spark, [(9, 1, "", "d")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    assert cow.read(spark, p).count() == 0


def test_duplicate_sequence_refuses(spark, tmp_path):
    p = _mk1(spark, str(tmp_path / "t"))
    bad = _feed(spark, [(1, 7, "a", "u"), (1, 7, "b", "u")])
    with pytest.raises(ValueError, match="duplicate sequence"):
        apply_changes_scd1(spark, p, bad, ["k"], "seq", delete_expr="op = 'd'")
    assert cow.current_snapshot(spark, p) == 1  # nothing half-committed


def _mk2(spark, path, feed):
    cow.create(
        spark, path, scd2_target_schema(feed, ["k"], "seq").limit(0)
    )
    return path


def test_scd2_versions_chain_across_batches(spark, tmp_path):
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    b1 = _feed(spark, [(1, 10, "a1", "u"), (1, 12, "a2", "u"), (2, 11, "b1", "u")])
    apply_changes_scd2(spark, p, b1, ["k"], "seq", delete_expr="op = 'd'")
    cur = {
        (r["k"], r["__start_seq"]): r for r in cow.read(spark, p).collect()
    }
    assert cur[(1, 10)]["__end_seq"] == 12 and not cur[(1, 10)]["__is_current"]
    assert cur[(1, 12)]["__end_seq"] is None and cur[(1, 12)]["__is_current"]
    b2 = _feed(spark, [(1, 15, "a3", "u"), (2, 16, "", "d")])
    apply_changes_scd2(spark, p, b2, ["k"], "seq", delete_expr="op = 'd'")
    cur = {
        (r["k"], r["__start_seq"]): r for r in cow.read(spark, p).collect()
    }
    # batch-1 open version closed at batch-2's first seq for the key
    assert cur[(1, 12)]["__end_seq"] == 15 and not cur[(1, 12)]["__is_current"]
    assert cur[(1, 15)]["__is_current"]
    # the delete closed key 2's open version and emitted NO version
    assert cur[(2, 11)]["__end_seq"] == 16 and not cur[(2, 11)]["__is_current"]
    assert (2, 16) not in cur
    assert len(cur) == 4


def test_scd2_delete_then_rebirth(spark, tmp_path):
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    apply_changes_scd2(
        spark, p, _feed(spark, [(1, 1, "a", "u")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    apply_changes_scd2(
        spark, p, _feed(spark, [(1, 2, "", "d")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    apply_changes_scd2(
        spark, p, _feed(spark, [(1, 3, "b", "u")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    cur = {r["__start_seq"]: r for r in cow.read(spark, p).collect()}
    assert cur[1]["__end_seq"] == 2 and not cur[1]["__is_current"]
    assert cur[3]["__is_current"] and cur[3]["v"] == "b"
    assert len(cur) == 2  # the delete emitted no version


def test_scd2_replayed_batch_is_exactly_once(spark, tmp_path):
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    b1 = _feed(spark, [(1, 10, "a1", "u"), (1, 12, "a2", "u")])
    apply_changes_scd2(
        spark, p, b1, ["k"], "seq", delete_expr="op = 'd'",
        txn_app_id="job", txn_version=1,
    )
    n = cow.read(spark, p).count()
    # the crashed-and-retried batch: close-out guard no-ops, version
    # append replays through the txn map — zero new rows
    st = apply_changes_scd2(
        spark, p, b1, ["k"], "seq", delete_expr="op = 'd'",
        txn_app_id="job", txn_version=1,
    )
    assert st["appended"].get("replayed") is True
    assert cow.read(spark, p).count() == n


def test_stream_apply_changes_scd2_exactly_once(spark, tmp_path):
    """File-source CDC stream -> SCD2 history: two sequence-ordered
    micro-batches produce exactly the one-window closed form, and the
    epoch txn ids make the version appends exactly-once."""
    import os
    import time

    from pyspark.sql import functions as F

    from data_warehouse_solution_spark.streaming.streams import (
        stream_apply_changes_scd2,
    )

    feed = spark.createDataFrame(
        [
            (1, 10, "a1", "u"), (2, 11, "b1", "u"), (1, 12, "a2", "u"),
            (2, 20, "", "d"), (1, 21, "a3", "u"), (3, 22, "c1", "u"),
        ],
        "k long, seq long, v string, op string",
    )
    import glob
    import shutil

    src = tmp_path / "incoming"
    src.mkdir()

    def _drop(df, name):
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    _drop(feed.filter("seq < 15"), "b1.parquet")
    time.sleep(1.1)  # file-source ordering is mtime-based
    _drop(feed.filter("seq >= 15"), "b2.parquet")
    table = str(tmp_path / "hist")
    stats = stream_apply_changes_scd2(
        spark, str(src), table, ["k"], "seq", delete_expr="op = 'd'"
    )
    assert len(stats) == 2
    assert stats[1]["appended"].get("replayed") is not True

    import data_warehouse_solution_spark.cowtable as cow

    got = {
        (r["k"], r["__start_seq"]): (r["__end_seq"], r["__is_current"])
        for r in cow.read(spark, table).collect()
    }
    # closed form: lead(seq) per key over the WHOLE feed, deletes
    # close without emitting
    assert got == {
        (1, 10): (12, False),
        (1, 12): (21, False),
        (1, 21): (None, True),
        (2, 11): (20, False),
        (3, 22): (None, True),
    }


def test_scd2_out_of_order_batch_refuses(spark, tmp_path):
    # ADVICE r12 (low): an out-of-order batch (or a replay WITHOUT a
    # txn id) makes the close-out merge a guarded no-op; appending its
    # versions anyway would leave two __is_current rows per key. The
    # engine must refuse BEFORE the append.
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    apply_changes_scd2(
        spark, p, _feed(spark, [(1, 20, "late", "u")]), ["k"], "seq",
        delete_expr="op = 'd'",
    )
    n = cow.read(spark, p).count()
    with pytest.raises(ValueError, match="out of order"):
        apply_changes_scd2(
            spark, p, _feed(spark, [(1, 10, "early", "u")]), ["k"], "seq",
            delete_expr="op = 'd'",
        )
    # no version rows were appended, no second open version exists
    assert cow.read(spark, p).count() == n
    cur = cow.read(spark, p).filter("__is_current").collect()
    assert len(cur) == 1 and cur[0]["__start_seq"] == 20


def test_scd2_mixed_batch_refusal_commits_nothing(spark, tmp_path):
    # ADVICE r13 (medium): a batch in-order for key 2 but out-of-order
    # for key 1 must refuse BEFORE the close-out merge commits — the
    # stale condition (open __start_seq >= batch __first_seq) is exactly
    # the set of rows the merge could not close, so it is detectable
    # pre-merge. A refusal must leave the table's snapshot untouched:
    # no closed-out open versions for the in-order keys, no append.
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    apply_changes_scd2(
        spark, p,
        _feed(spark, [(1, 20, "late", "u"), (2, 5, "base", "u")]),
        ["k"], "seq", delete_expr="op = 'd'",
    )
    snap = cow.current_snapshot(spark, p)
    before = {
        (r["k"], r["__start_seq"]): (r["__end_seq"], r["__is_current"])
        for r in cow.read(spark, p).collect()
    }
    with pytest.raises(ValueError, match="out of order"):
        apply_changes_scd2(
            spark, p,
            _feed(spark, [(1, 10, "early", "u"), (2, 7, "next", "u")]),
            ["k", ], "seq", delete_expr="op = 'd'",
        )
    # zero commits: snapshot unchanged, key 2's open version NOT closed
    assert cow.current_snapshot(spark, p) == snap
    after = {
        (r["k"], r["__start_seq"]): (r["__end_seq"], r["__is_current"])
        for r in cow.read(spark, p).collect()
    }
    assert after == before
    assert after[(2, 5)] == (None, True)


def test_scd2_replay_without_txn_refuses(spark, tmp_path):
    f0 = _feed(spark, [])
    p = _mk2(spark, str(tmp_path / "t"), f0)
    b = _feed(spark, [(1, 10, "a", "u"), (1, 12, "b", "u")])
    apply_changes_scd2(spark, p, b, ["k"], "seq", delete_expr="op = 'd'")
    with pytest.raises(ValueError, match="out of order"):
        apply_changes_scd2(spark, p, b, ["k"], "seq", delete_expr="op = 'd'")
    # exactly one open version survived — no duplicated history
    assert cow.read(spark, p).filter("__is_current").count() == 1


def test_apply_changes_sql_scd1_and_refusals(spark, tmp_path):
    # r13: the DLT statement form drives the SCD operators via the gate
    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "t1")
    _feed(
        spark, [(1, 1, "a", "u"), (1, 2, "b", "u"), (2, 1, "x", "u"), (2, 2, "", "d")]
    ).createOrReplaceTempView("ac_b1")
    run_sql(
        spark,
        f"APPLY CHANGES INTO cow.`{p}` FROM ac_b1 KEYS (k) "
        "APPLY AS DELETE WHEN op = 'd' SEQUENCE BY seq",
    )
    got = {r["k"]: r["v"] for r in cow.read(spark, p).collect()}
    assert got == {1: "b"}  # key 2's last change is a delete
    # out-of-order stale batch regresses nothing (s.seq >= t.seq guard)
    _feed(spark, [(1, 1, "stale", "u")]).createOrReplaceTempView("ac_b2")
    run_sql(
        spark,
        f"APPLY CHANGES INTO cow.`{p}` FROM ac_b2 KEYS (k) SEQUENCE BY seq",
    )
    assert {r["k"]: r["v"] for r in cow.read(spark, p).collect()} == {1: "b"}
    # refusal corpus: parse errors must not half-create anything
    bad = [
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 SEQUENCE BY seq",  # no KEYS
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS () SEQUENCE BY seq",
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS (k)",  # no SEQUENCE
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS (ghost) SEQUENCE BY seq",
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS (k) SEQUENCE BY ghost",
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS (k) "
        "NONSENSE HERE SEQUENCE BY seq",
        f"APPLY CHANGES INTO cow.`{p}x` FROM ac_b1 KEYS (k) "
        "SEQUENCE BY seq STORED AS SCD TYPE 3",
    ]
    for stmt in bad:
        with pytest.raises(ValueError):
            run_sql(spark, stmt)
        assert not cow.is_cow_table(spark, f"{p}x"), stmt


def test_apply_changes_sql_scd2_auto_creates_history_frame(spark, tmp_path):
    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "t2")
    _feed(spark, [(1, 10, "a", "u"), (1, 12, "b", "u")]).createOrReplaceTempView(
        "ac2_b1"
    )
    run_sql(
        spark,
        f"APPLY CHANGES INTO cow.`{p}` FROM ac2_b1 KEYS (k) "
        "APPLY AS DELETE WHEN op = 'd' SEQUENCE BY seq STORED AS SCD TYPE 2",
    )
    rows = {r["__start_seq"]: r for r in cow.read(spark, p).collect()}
    assert set(cow.read(spark, p).columns) >= {"__start_seq", "__end_seq", "__is_current"}
    assert rows[10]["__end_seq"] == 12 and not rows[10]["__is_current"]
    assert rows[12]["__is_current"]


def test_apply_changes_sql_bare_name_lands_under_catalog(spark, tmp_path):
    # r13 review fix: an unregistered bare-name target must materialize
    # under the catalog dir and register (never at a relative path)
    from data_warehouse_solution_spark import catalog
    from data_warehouse_solution_spark.sql_gate import run_sql

    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    spark.conf.set("spark.dws.cow.catalogDir", str(tmp_path / "_cat"))
    try:
        _feed(spark, [(1, 1, "a", "u")]).createOrReplaceTempView("ac_name_b")
        run_sql(
            spark,
            "APPLY CHANGES INTO ac_target FROM ac_name_b KEYS (k) "
            "SEQUENCE BY seq",
        )
        p = catalog.resolve(spark, "ac_target")
        assert p == f"{tmp_path / '_cat'}/tables/ac_target"
        assert cow.read(spark, p).count() == 1
        # second batch resolves through the new registration
        _feed(spark, [(1, 2, "b", "u")]).createOrReplaceTempView("ac_name_b")
        run_sql(
            spark,
            "APPLY CHANGES INTO ac_target FROM ac_name_b KEYS (k) "
            "SEQUENCE BY seq",
        )
        assert [r["v"] for r in cow.read(spark, p).collect()] == ["b"]
        run_sql(spark, "DROP TABLE ac_target")
    finally:
        if old is None:
            spark.conf.unset("spark.dws.cow.catalogDir")
        else:
            spark.conf.set("spark.dws.cow.catalogDir", old)

def test_apply_changes_refused_first_batch_leaves_no_target(spark, tmp_path):
    # ADVICE r13 (low): a refused FIRST batch (duplicate sequences /
    # SCD2 preconditions) must not leave an empty created-and-
    # registered table behind — source validation runs before
    # cow.create/_cat.register, and a backstop cleans up on refusal.
    import os

    from data_warehouse_solution_spark import catalog
    from data_warehouse_solution_spark.sql_gate import run_sql

    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    spark.conf.set("spark.dws.cow.catalogDir", str(tmp_path / "_cat"))
    try:
        _feed(
            spark, [(1, 5, "a", "u"), (1, 5, "b", "u")]
        ).createOrReplaceTempView("ac_dup_b")
        with pytest.raises(ValueError, match="duplicate sequence"):
            run_sql(
                spark,
                "APPLY CHANGES INTO ac_dup_tgt FROM ac_dup_b KEYS (k) "
                "SEQUENCE BY seq",
            )
        assert catalog.resolve(spark, "ac_dup_tgt") is None
        assert not os.path.exists(f"{tmp_path / '_cat'}/tables/ac_dup_tgt")
        # path target, SCD2: same — no table directory materialized
        p2 = str(tmp_path / "ac_dup_t2")
        with pytest.raises(ValueError, match="duplicate sequence"):
            run_sql(
                spark,
                f"APPLY CHANGES INTO cow.`{p2}` FROM ac_dup_b KEYS (k) "
                "SEQUENCE BY seq STORED AS SCD TYPE 2",
            )
        assert not cow.is_cow_table(spark, p2)
    finally:
        if old is None:
            spark.conf.unset("spark.dws.cow.catalogDir")
        else:
            spark.conf.set("spark.dws.cow.catalogDir", old)
