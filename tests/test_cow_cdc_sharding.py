"""Round-5 COW surface: change data feed (`cowtable.changes`),
range-clustered compaction, and manifest sharding.

Invariants:
- `changes(a, b)` is the exact row-level bag delta, attributed to the
  commit that introduced it; carried-over rows of rewritten files
  cancel, so a `compact` commit yields ZERO change rows;
- `compact(cluster_by=...)` is content-identical but makes manifest
  min/max stats a range index (point predicates prune to ~1 file);
- beyond MANIFEST_SHARD_ROWS entries the file list lives in shard
  files, transparently reassembled on load, expired by vacuum.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.tables import load_tables

from .conftest import SF_SMOKE


@pytest.fixture()
def orders_cow(spark, tmp_path):
    path = str(tmp_path / "orders_cdc")
    o = (
        load_tables(spark, SF_SMOKE, ("orders",))["orders"]
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartition(6)
    )
    cow.create(spark, path, o)
    return path, o


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_changes_update_commit_is_delete_plus_insert(spark, orders_cow):
    path, o = orders_cow
    cond = "o_orderstatus = 'F' AND o_orderkey % 3 = 0"
    cow.update(spark, path, cond, {"o_totalprice": "o_totalprice + 1000000"})
    ch = cow.changes(spark, path, 1, 2)
    matched = o.filter(F.expr(cond))
    want_deletes = _rows(matched)
    want_inserts = _rows(matched.withColumn("o_totalprice", F.col("o_totalprice") + 1000000))
    got_del = _rows(ch.filter("_change_type = 'delete'").drop("_change_type", "_commit_snapshot"))
    got_ins = _rows(ch.filter("_change_type = 'insert'").drop("_change_type", "_commit_snapshot"))
    assert got_del == want_deletes
    assert got_ins == want_inserts
    assert ch.select("_commit_snapshot").distinct().collect()[0][0] == 2


def test_changes_attributes_each_commit(spark, orders_cow):
    path, o = orders_cow
    del_cond = "o_totalprice < 10000"
    cow.delete(spark, path, del_cond)  # snapshot 2
    extra = spark.createDataFrame(
        [(-1, -1, "X", 1.0)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    cow.append(spark, path, extra)  # snapshot 3
    ch = cow.changes(spark, path, 1, 3)
    by_commit = {
        (r["_commit_snapshot"], r["_change_type"]): r["n"]
        for r in ch.groupBy("_commit_snapshot", "_change_type").agg(F.count("*").alias("n")).collect()
    }
    n_deleted = o.filter(F.expr(del_cond)).count()
    assert by_commit == {(2, "delete"): n_deleted, (3, "insert"): 1}
    # append commit's insert is the appended row itself
    ins = ch.filter("_commit_snapshot = 3").drop("_change_type", "_commit_snapshot")
    assert _rows(ins) == _rows(extra)


def test_changes_compact_commit_yields_zero_rows(spark, orders_cow):
    path, _ = orders_cow
    cow.compact(spark, path, target_files=2)  # snapshot 2: content-identical
    assert cow.changes(spark, path, 1, 2).count() == 0


def test_changes_rollback_is_inverse_delta(spark, orders_cow):
    path, _ = orders_cow
    cond = "o_orderkey % 5 = 0"
    cow.update(spark, path, cond, {"o_orderstatus": "'R'"})  # snap 2
    cow.rollback(spark, path, 1)  # snap 3 restores snapshot-1 content
    fwd = cow.changes(spark, path, 1, 2).drop("_commit_snapshot")
    back = cow.changes(spark, path, 2, 3).drop("_commit_snapshot")
    flip = back.withColumn(
        "_change_type",
        F.when(F.col("_change_type") == "insert", "delete").otherwise("insert"),
    )
    assert fwd.exceptAll(flip).count() == 0 and flip.exceptAll(fwd).count() == 0


def test_changes_empty_range_and_bad_range(spark, orders_cow):
    path, _ = orders_cow
    assert cow.changes(spark, path, 1, 1).count() == 0
    with pytest.raises(ValueError, match="after"):
        cow.changes(spark, path, 2, 1)


def test_clustered_compact_tightens_stat_pruning(spark, orders_cow):
    path, o = orders_cow
    m1 = cow._load_manifest(spark, path, 1)
    # hash-repartitioned layout: a narrow key range hits ~every file
    probe = "o_orderkey <= 64"
    assert len(cow.stats_candidate_files(m1, probe)) == len(m1["files"])
    cow.compact(spark, path, target_files=6, cluster_by=["o_orderkey"])
    m2 = cow._load_manifest(spark, path, cow.current_snapshot(spark, path))
    cands = cow.stats_candidate_files(m2, probe)
    assert len(m2["files"]) == 6
    assert len(cands) <= 2  # range-clustered: stats are a range index
    got = cow.read(spark, path)
    assert got.exceptAll(o).count() == 0 and o.exceptAll(got).count() == 0


def test_clustered_compact_rejects_unknown_column(spark, orders_cow):
    path, _ = orders_cow
    with pytest.raises(ValueError, match="cluster"):
        cow.compact(spark, path, cluster_by=["nope"])


def test_manifest_sharding_roundtrip_and_dml(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(cow, "MANIFEST_SHARD_ROWS", 4)
    path = str(tmp_path / "sharded")
    o = (
        load_tables(spark, SF_SMOKE, ("orders",))["orders"]
        .select("o_orderkey", "o_totalprice")
        .repartition(10)
    )
    cow.create(spark, path, o)
    raw = cow.json.loads(cow._read_file(spark, cow._manifest_path(path, 1)).decode())
    assert "files" not in raw and len(raw["file_shards"]) == 3  # ceil(10/4)
    m = cow._load_manifest(spark, path, 1)
    assert len(m["files"]) == 10  # transparently reassembled
    assert cow._list_snapshots(spark, path) == [1]  # shards aren't snapshots
    got = cow.read(spark, path)
    assert got.exceptAll(o).count() == 0 and o.exceptAll(got).count() == 0
    # DML on a sharded manifest commits a new (re-sharded) snapshot
    stats = cow.delete(spark, path, "o_totalprice < 5000")
    assert stats["snapshot_id"] == 2
    assert cow.read(spark, path).filter("o_totalprice < 5000").count() == 0
    assert cow.read(spark, path, snapshot=1).count() == o.count()  # time travel


def test_vacuum_expires_shard_files(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(cow, "MANIFEST_SHARD_ROWS", 2)
    path = str(tmp_path / "shard_vac")
    o = (
        load_tables(spark, SF_SMOKE, ("orders",))["orders"]
        .select("o_orderkey", "o_totalprice")
        .repartition(5)
    )
    cow.create(spark, path, o)
    cow.compact(spark, path, target_files=5)  # snapshot 2, also sharded
    snap1_shards = set(
        cow.json.loads(
            cow._read_file(spark, cow._manifest_path(path, 1)).decode()
        )["file_shards"]
    )
    snap2_shards = set(
        cow.json.loads(
            cow._read_file(spark, cow._manifest_path(path, 2)).decode()
        )["file_shards"]
    )
    cow.vacuum(spark, path, keep_last=1, min_file_age_seconds=0)
    fs, _ = cow._fs(spark, path)
    names = {
        st.getPath().getName()
        for st in fs.listStatus(cow._jpath(spark, f"{path}/{cow.MANIFEST_DIR}"))
    }
    # r12 ref-count semantics (content-addressed shards are SHARED):
    # every shard the retained snapshot references survives; shards
    # only the expired snapshot referenced are gone
    assert snap2_shards <= names
    assert not (snap1_shards - snap2_shards) & names
    assert cow.read(spark, path).count() == o.count()
    with pytest.raises(ValueError, match="not available"):
        cow.read(spark, path, snapshot=1)


def test_consume_changes_cursor_lifecycle(spark, tmp_path):
    """First consume = full content as inserts; commit advances the
    cursor; an uncommitted consumer re-reads the same delta
    (at-least-once); after commit only NEW commits flow."""
    path = str(tmp_path / "cdc_consume")
    cursor = str(tmp_path / "cdc_cursor.json")
    o = spark.range(10).withColumnRenamed("id", "k").repartition(2)
    cow.create(spark, path, o)

    delta, commit = cow.consume_changes(spark, path, cursor)
    assert delta.filter("_change_type = 'insert'").count() == 10
    assert delta.count() == 10
    # not committed yet: a second consumer sees the same delta
    again, _ = cow.consume_changes(spark, path, cursor)
    assert again.count() == 10
    assert commit() == 1

    # no new commits: empty, schema intact
    empty, commit2 = cow.consume_changes(spark, path, cursor)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "_change_type", "_commit_snapshot"}
    commit2()

    cow.delete(spark, path, "k >= 7")  # snapshot 2
    cow.append(spark, path, spark.range(100, 103).withColumnRenamed("id", "k"))  # 3
    delta2, commit3 = cow.consume_changes(spark, path, cursor)
    got = {
        (r["_commit_snapshot"], r["_change_type"], r["k"]) for r in delta2.collect()
    }
    assert got == {(2, "delete", 7), (2, "delete", 8), (2, "delete", 9),
                   (3, "insert", 100), (3, "insert", 101), (3, "insert", 102)}
    assert commit3() == 3


def test_null_count_stats_prune_is_null(spark, tmp_path):
    """Per-file null counts: IS NULL prunes files with zero nulls,
    IS NOT NULL prunes all-null files, comparisons prune all-null
    columns, and a DELETE WHERE col IS NULL rewrites only the files
    that actually hold nulls."""
    path = str(tmp_path / "null_stats")
    df = spark.sql("""
        SELECT id AS k,
               CASE WHEN id < 50 THEN CAST(NULL AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS v
        FROM range(100)
    """).repartitionByRange(4, "k")
    cow.create(spark, path, df)
    m = cow._load_manifest(spark, path, 1)
    # files covering k<50 hold nulls; the rest record v's zero-null proof
    isnull_cands = cow.stats_candidate_files(m, "v IS NULL")
    notnull_cands = cow.stats_candidate_files(m, "v IS NOT NULL")
    assert 0 < len(isnull_cands) < len(m["files"])
    assert 0 < len(notnull_cands) < len(m["files"])
    assert {f["name"] for f in isnull_cands} | {f["name"] for f in notnull_cands} == {
        f["name"] for f in m["files"]
    }
    # all-null files refute comparisons on that column (3VL)
    cmp_cands = cow.stats_candidate_files(m, "v >= 0")
    assert {f["name"] for f in cmp_cands} == {f["name"] for f in notnull_cands}
    stats = cow.delete(spark, path, "v IS NULL")
    assert stats["files_rewritten"] == len(isnull_cands)
    assert cow.read(spark, path).count() == 50
    assert cow.read(spark, path).filter("v IS NULL").count() == 0


def test_null_test_with_unknown_column_still_errors(spark, tmp_path):
    """A typo'd column in the predicate must surface Spark's analysis
    error, not silently no-op via stats refutation."""
    path = str(tmp_path / "null_typo")
    cow.create(spark, path, spark.range(10).withColumnRenamed("id", "k"))
    with pytest.raises(Exception, match="nope|UNRESOLVED|cannot be resolved"):
        cow.delete(spark, path, "nope IS NULL")


def test_zorder_compact_prunes_both_dimensions(spark, tmp_path):
    """Morton clustering: after zorder compact on (x, y), a slab
    predicate on EITHER dimension prunes to a sqrt-ish fraction of
    files; linear clustering on [x, y] would leave y-predicates
    touching every file. Content stays identical."""
    path = str(tmp_path / "zorder")
    grid = spark.sql(
        "SELECT id % 64 AS x, CAST(id / 64 AS INT) AS y, id AS payload FROM range(4096)"
    ).repartition(8)  # hash layout: no dimension prunes at all
    cow.create(spark, path, grid)
    cow.compact(spark, path, target_files=16, cluster_by=["x", "y"], zorder=True)
    m = cow._load_manifest(spark, path, cow.current_snapshot(spark, path))
    assert len(m["files"]) == 16
    x_c = cow.stats_candidate_files(m, "x <= 7")   # 1/8 slab in x
    y_c = cow.stats_candidate_files(m, "y <= 7")   # 1/8 slab in y
    assert len(x_c) <= 8, f"x slab hit {len(x_c)}/16 files"
    assert len(y_c) <= 8, f"y slab hit {len(y_c)}/16 files"
    got = cow.read(spark, path)
    assert got.count() == 4096
    assert got.exceptAll(
        spark.sql("SELECT id % 64 AS x, CAST(id / 64 AS INT) AS y, id AS payload FROM range(4096)")
    ).count() == 0


def test_zorder_requires_two_columns(spark, tmp_path):
    path = str(tmp_path / "zorder_one")
    cow.create(spark, path, spark.range(10).withColumnRenamed("id", "k"))
    with pytest.raises(ValueError, match="zorder"):
        cow.compact(spark, path, cluster_by=["k"], zorder=True)


def test_append_retries_lost_commit_race(spark, tmp_path, monkeypatch):
    """Fast-append loop: an append that loses the optimistic-commit
    race reloads the new head and re-commits its already-staged files
    — no restage, no error — because appends have no read-set."""
    path = str(tmp_path / "append_race")
    cow.create(spark, path, spark.range(10).withColumnRenamed("id", "k"))
    real_commit = cow._commit
    state = {"raced": False}

    def racing_commit(sp, table_path, manifest):
        if not state["raced"] and manifest["operation"] == "append":
            state["raced"] = True
            # a competitor wins the SAME snapshot id first (its commit
            # carries only the pre-existing files)
            competitor = {
                **manifest,
                "operation": "competitor_noop",
                "files": [f for f in manifest["files"] if f["name"].startswith("snap00000001")],
            }
            real_commit(sp, table_path, competitor)
        return real_commit(sp, table_path, manifest)

    monkeypatch.setattr(cow, "_commit", racing_commit)
    stats = cow.append(spark, path, spark.range(100, 103).withColumnRenamed("id", "k"))
    assert state["raced"]
    assert stats["snapshot_id"] == 3  # competitor took 2; retry landed 3
    got = cow.read(spark, path)
    assert got.count() == 13
    assert got.filter("k >= 100").count() == 3


def test_append_exhausts_retries_raises(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "append_lose")
    cow.create(spark, path, spark.range(5).withColumnRenamed("id", "k"))
    real_commit = cow._commit

    def always_beaten(sp, table_path, manifest):
        if manifest["operation"] == "append":
            real_commit(sp, table_path, {**manifest, "operation": "competitor_noop"})
        return real_commit(sp, table_path, manifest)

    monkeypatch.setattr(cow, "_commit", always_beaten)
    with pytest.raises(cow.CowConcurrentWrite):
        cow.append(
            spark, path, spark.range(7).withColumnRenamed("id", "k"), max_retries=2
        )


# -- cowcdc: the STREAMING Change-Data-Feed source --------------------------


def test_cowcdc_stream_matches_batch_changes(spark, orders_cow):
    """A running cowcdc stream delivers exactly the batch changes()
    delta, one micro-batch per poll, and picks up commits made AFTER
    the stream started."""
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    path, _ = orders_cow
    register_cow_cdc(spark)
    cow.delete(spark, path, "o_orderstatus = 'F' AND o_totalprice < 30000")
    cow.update(spark, path, "o_orderkey % 50 = 0", {"o_totalprice": "1.0"})
    stream = (
        spark.readStream.format("cowcdc")
        .option("tablePath", path)
        .option("startingSnapshot", "1")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_all")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.sql("select * from cdc_all"))
        expect = _rows(cow.changes(spark, path, 1))
        assert got == expect and got
        # commits AFTER stream start arrive in the next micro-batch
        cow.append(
            spark,
            path,
            spark.createDataFrame(
                [(-1, -1, "N", 5.0)],
                "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
            ),
        )
        q.processAllAvailable()
        got2 = _rows(spark.sql("select * from cdc_all"))
        assert got2 - got == {(-1, -1, "N", 5.0, "insert", 4)}
    finally:
        q.stop()


def test_cowcdc_checkpoint_resume_is_exactly_once(spark, orders_cow, tmp_path):
    """Stop the stream, commit more DML, restart with the SAME
    checkpoint: only the new commits are delivered (offsets live in
    Spark's checkpoint — no duplicate, no gap)."""
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    path, _ = orders_cow
    register_cow_cdc(spark)
    ckpt = str(tmp_path / "cdc_ckpt")
    sink = str(tmp_path / "cdc_sink")
    cow.delete(spark, path, "o_orderkey % 2 = 0")  # snap 2

    def _run():
        stream = (
            spark.readStream.format("cowcdc")
            .option("tablePath", path)
            .option("startingSnapshot", "1")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")  # memory sink can't recover
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return _rows(spark.read.parquet(sink))

    first = _run()
    assert first == _rows(cow.changes(spark, path, 1, 2))
    cow.update(spark, path, "o_orderkey % 3 = 0", {"o_totalprice": "2.0"})  # snap 3
    second = _run()  # sink accumulates; checkpoint delivers ONLY snap 3
    assert second - first == _rows(cow.changes(spark, path, 2, 3))
    assert len(second) == len(first) + len(_rows(cow.changes(spark, path, 2, 3)))


def test_cowcdc_compact_commit_streams_zero_rows(spark, orders_cow):
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    path, _ = orders_cow
    register_cow_cdc(spark)
    cow.compact(spark, path, target_files=2)
    stream = (
        spark.readStream.format("cowcdc")
        .option("tablePath", path)
        .option("startingSnapshot", "1")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_compact")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from cdc_compact").count() == 0
    finally:
        q.stop()


# -- round-5 review fixes: regression pins ----------------------------------


def test_lost_sharded_commit_race_cannot_corrupt_winner(spark, tmp_path, monkeypatch):
    """Shard file names are commit-attempt-unique: a LOSING sharded
    commit must neither overwrite nor delete the winner's shard files
    (deterministic names did both — committed-snapshot corruption)."""
    monkeypatch.setattr(cow, "MANIFEST_SHARD_ROWS", 2)
    path = str(tmp_path / "race_shards")
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"].select(
        "o_orderkey", "o_totalprice"
    ).repartition(6)
    cow.create(spark, path, o)
    m_stale = cow._load_manifest(spark, path, 1)
    # winner commits snapshot 2 (sharded: >2 files survive)
    cow.delete(spark, path, "o_orderkey = 1")
    winner = cow._load_manifest(spark, path, 2)
    assert len(winner["files"]) > 2
    # loser attempts the SAME snapshot id with its own sharded list
    loser_manifest = {
        "snapshot_id": 2,
        "parent": 1,
        "operation": "delete",
        "schema": m_stale["schema"],
        "partition_by": [],
        "bloom_columns": [],
        "files": m_stale["files"],
    }
    with pytest.raises(cow.CowConcurrentWrite):
        cow._commit(spark, path, loser_manifest)
    # the winner's snapshot must still load, full file list intact
    reread = cow._load_manifest(spark, path, 2)
    assert {f["name"] for f in reread["files"]} == {f["name"] for f in winner["files"]}
    assert cow.read(spark, path).count() == o.count() - 1


def test_bloom_probe_canonicalizes_literal_types(spark, tmp_path):
    """`k = '0123'` against an int bloom column must probe the CAST
    form ('123'), not the raw literal — the engine casts and matches,
    so pruning on '0123' would silently skip the row."""
    assert cow._bloom_probe_value("0123", "bigint") == "123"
    assert cow._bloom_probe_value(123, "bigint") == "123"
    assert cow._bloom_probe_value("0123", "string") == "0123"
    assert cow._bloom_probe_value(123, "string") is None  # cross-type: no prune
    assert cow._bloom_probe_value("abc", "bigint") is None
    assert cow._bloom_probe_value(1.5, "double") is None
    path = str(tmp_path / "bloom_cast")
    df = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    cow.create(spark, path, df.repartition(4), bloom_columns=["k"])
    res = cow.delete(spark, path, "k = '0123'")  # engine: k = 123
    assert res["files_rewritten"] == 1
    assert cow.read(spark, path).filter("k = 123").count() == 0


def test_cowcdc_partitioned_table_streams_partition_values(spark, tmp_path):
    """Partition columns are stripped from the data files; the CDC
    stream must re-inject them from the Hive paths (typed), and a
    partition-moving UPDATE must stream as delete+insert, not cancel."""
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    register_cow_cdc(spark)
    path = str(tmp_path / "cdc_part")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, part string, v double",
    )
    cow.create(spark, path, df, partition_by=["part"])
    cow.update(spark, path, "k = 2", {"part": "'b'"})  # moves partitions ONLY
    stream = (
        spark.readStream.format("cowcdc")
        .option("tablePath", path)
        .option("startingSnapshot", "1")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_part")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.sql("select * from cdc_part"))
    finally:
        q.stop()
    assert got == {(2, "a", 20.0, "delete", 2), (2, "b", 20.0, "insert", 2)}


def test_cowcdc_starting_snapshot_zero_replays_history(spark, tmp_path):
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    register_cow_cdc(spark)
    path = str(tmp_path / "cdc_zero")
    cow.create(spark, path, spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    cow.delete(spark, path, "k = 1")
    stream = (
        spark.readStream.format("cowcdc")
        .option("tablePath", path)
        .option("startingSnapshot", "0")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_zero")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.sql("select * from cdc_zero"))
    finally:
        q.stop()
    assert got == {
        (1, 1.0, "insert", 1),
        (2, 2.0, "insert", 1),
        (1, 1.0, "delete", 2),
    }


def test_zorder_key_stays_positive_for_four_columns(spark, orders_cow):
    """bits*k must stay under the sign bit: with 4+ cluster columns
    the per-dimension bits are capped so the Morton key never goes
    negative (a negative key inverts the sort for the top bucket)."""
    path, o = orders_cow
    df = o.withColumn("extra", (F.col("o_orderkey") % 97).cast("double"))
    key = cow._zorder_key(
        df, ["o_orderkey", "o_custkey", "o_totalprice", "extra"]
    )
    lo = df.select(F.min(key).alias("lo")).collect()[0]["lo"]
    assert lo >= 0


def test_consume_changes_recovers_from_prev_cursor(spark, tmp_path):
    """A crash between commit()'s rename-aside and the final rename
    leaves only cursor.prev: the next consume must resume from it
    (same delta again — at-least-once), NOT replay the whole table."""
    path = str(tmp_path / "cdc_cursor_crash")
    cursor = str(tmp_path / "cursor.json")
    cow.create(spark, path, spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    delta, commit = cow.consume_changes(spark, path, cursor)
    delta.count()
    commit()  # cursor at snapshot 1
    cow.delete(spark, path, "k = 1")  # snapshot 2
    # simulate the torn advance: cursor moved aside, new one never landed
    fs, cjp = cow._fs(spark, cursor)
    assert fs.rename(cjp, cow._jpath(spark, f"{cursor}.prev"))
    delta2, commit2 = cow.consume_changes(spark, path, cursor)
    rows = {tuple(r) for r in delta2.collect()}
    assert rows == {(1, 1.0, "delete", 2)}  # from snapshot 1, not a full replay
    commit2()
    delta3, _ = cow.consume_changes(spark, path, cursor)
    assert delta3.count() == 0


def test_history_and_describe_read_zero_shards(spark, tmp_path, monkeypatch):
    # r13 (VERDICT r12 punch #4): history()/describe_detail on a
    # sharded multi-commit table must be manifest-PROPER reads only —
    # counts come from commit-time stamps (n_files/n_rows/n_rows_live),
    # never from expanding file shards. O(snapshots), not
    # O(snapshots × files), on exactly the streaming tables the append
    # fast path makes cheap to grow.
    monkeypatch.setattr(cow, "MANIFEST_SHARD_ROWS", 4)
    path = str(tmp_path / "hist")
    df = spark.range(40).selectExpr("id as k", "cast(id as double) as v").repartition(10)
    cow.create(spark, path, df)
    for i in range(6):
        cow.append(
            spark, path,
            spark.range(3).selectExpr(f"id + {100 + i * 10} as k", "cast(id as double) as v"),
        )
    cow.create_tag(spark, path, "t1")  # metadata-only commit in the mix
    cow.delete(spark, path, "k < 4")   # a rewrite commit (changes live rows)
    cow._SHARD_CACHE.clear()
    reads = []
    real = cow._read_shard
    monkeypatch.setattr(
        cow, "_read_shard", lambda s, p: (reads.append(p), real(s, p))[1]
    )
    h = cow.history(spark, path)
    assert reads == [], f"history expanded shards: {reads}"
    d = cow.describe_detail(spark, path)
    assert reads == [], f"describe_detail expanded shards: {reads}"
    # and the stamped numbers equal the expansion-derived truth
    monkeypatch.setattr(cow, "_read_shard", real)
    full = cow._load_manifest(spark, path, h[-1]["snapshot_id"])
    assert h[-1]["n_files"] == len(full["files"])
    assert h[-1]["n_rows"] == sum(f["rows"] for f in full["files"])
    assert d["num_rows_live"] == cow.read(spark, path).count()
    assert h[-1]["n_rows_live"] == d["num_rows_live"]
    # the tag commit's counts carried verbatim from its parent
    tag_row = next(r for r in h if r["operation"] == "create_tag_t1")
    parent_row = next(
        r for r in h if r["snapshot_id"] == tag_row["snapshot_id"] - 1
    )
    assert (tag_row["n_files"], tag_row["n_rows"]) == (
        parent_row["n_files"], parent_row["n_rows"]
    )


def test_metadata_only_commit_is_o1_on_sharded_table(spark, tmp_path, monkeypatch):
    # r13: a tag on a sharded table writes ZERO shards AND never reads
    # one — the child references the parent's shard names verbatim
    # (_commit_carry), so a metadata-only commit is O(1) at any size.
    monkeypatch.setattr(cow, "MANIFEST_SHARD_ROWS", 4)
    path = str(tmp_path / "tagmeta")
    cow.create(
        spark, path,
        spark.range(40).selectExpr("id as k", "cast(id as double) as v").repartition(10),
    )
    cow._SHARD_CACHE.clear()
    reads = []
    real = cow._read_shard
    monkeypatch.setattr(
        cow, "_read_shard", lambda s, p: (reads.append(p), real(s, p))[1]
    )
    cow.create_tag(spark, path, "zero_io")
    assert reads == [], f"tag commit read shards: {reads}"
    raw1 = cow.json.loads(cow._read_file(spark, cow._manifest_path(path, 1)).decode())
    raw2 = cow.json.loads(cow._read_file(spark, cow._manifest_path(path, 2)).decode())
    assert raw2["file_shards"] == raw1["file_shards"]  # same names, by reference
    assert raw2["n_files"] == raw1["n_files"] and raw2["n_rows"] == raw1["n_rows"]
    monkeypatch.setattr(cow, "_read_shard", real)
    assert cow.read(spark, path).count() == 40
    assert cow.resolve_ref(spark, path, "zero_io") == 1
