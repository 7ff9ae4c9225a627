"""The ``cow`` BATCH Data Source (``sources/cow_batch.py``): DSv2
reads must mirror ``cowtable.read`` exactly — manifest-schema
authority (evolved columns NULL from old files), Hive partition
re-injection, version and timestamp time travel, clear errors."""

from __future__ import annotations

import datetime

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch


def _read(spark, path, **opts):
    r = spark.read.format("cow").option("tablePath", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_source_matches_cowtable_read(spark, tmp_path):
    path = str(tmp_path / "t")
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "k long, v string, x double"),
    )
    cow.append(spark, path, spark.createDataFrame([(3, "c", 3.5)], "k long, v string, x double"))
    register_cow_batch(spark)
    got = {tuple(r) for r in _read(spark, path).collect()}
    want = {tuple(r) for r in cow.read(spark, path).collect()}
    assert got == want and len(got) == 3


def test_batch_source_time_travel_and_errors(spark, tmp_path):
    path = str(tmp_path / "tt")
    cow.create(spark, path, spark.createDataFrame([(1,)], "k long"))
    mid = datetime.datetime.now(datetime.timezone.utc).isoformat()
    cow.append(spark, path, spark.createDataFrame([(2,)], "k long"))
    register_cow_batch(spark)
    assert _read(spark, path, versionAsOf="1").count() == 1
    assert _read(spark, path, timestampAsOf=mid).count() == 1
    assert _read(spark, path).count() == 2
    with pytest.raises(Exception, match="precedes the first commit"):
        _read(spark, path, timestampAsOf="2000-01-01").count()
    with pytest.raises(Exception, match="not available"):
        _read(spark, path, versionAsOf="99").count()
    with pytest.raises(Exception, match="not both"):
        _read(spark, path, versionAsOf="1", timestampAsOf=mid).count()


def test_batch_source_schema_evolution_and_partitions(spark, tmp_path):
    path = str(tmp_path / "evo")
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, part string"),
        partition_by=["part"],
    )
    cow.alter_add_column(spark, path, "extra", "int")
    cow.append(
        spark,
        path,
        spark.createDataFrame([(3, "x", 7)], "k long, part string, extra int"),
    )
    register_cow_batch(spark)
    rows = {tuple(r) for r in _read(spark, path).collect()}
    # pre-evolution files read extra as NULL; partition values re-injected
    assert rows == {(1, "x", None), (2, "y", None), (3, "x", 7)}
    # the versioned schema is the OLD one at snapshot 1
    assert _read(spark, path, versionAsOf="1").columns == ["k", "part"]


# -------------------------------------------------- pushFilters pruning


def _reader_for(spark, path, filters):
    from data_warehouse_solution_spark.sources.cow_batch import CowBatchDataSource

    schema = cow.read(spark, path).schema
    rdr = CowBatchDataSource._reader_cls(schema, {"tablePath": path})
    residual = list(rdr.pushFilters(filters))
    return rdr, residual


def test_pushdown_prunes_files_and_results_stay_exact(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, In, IsNull, LessThan

    path = str(tmp_path / "prune")
    df = spark.range(100).selectExpr("id AS k", "CAST(id % 7 AS string) AS v")
    # 10 files with disjoint k ranges + a bloom on v
    cow.create(
        spark, path, df.repartitionByRange(10, "k"), bloom_columns=["v"]
    )
    register_cow_batch(spark)
    total = len(_reader_for(spark, path, [])[0].partitions())
    assert total == 10

    # range predicate: only the files whose [min,max] overlaps survive
    rdr, residual = _reader_for(spark, path, [LessThan(("k",), 25)])
    assert len(residual) == 1  # every filter returned for row re-check
    assert 1 <= len(rdr.partitions()) <= 4

    # point predicate on the bloom-indexed column prunes via bloom
    rdr, _ = _reader_for(spark, path, [EqualTo(("v",), "3")])
    assert len(rdr.partitions()) <= total

    # IN-list on k
    rdr, _ = _reader_for(spark, path, [In(("k",), (1, 2, 99))])
    assert len(rdr.partitions()) <= 3

    # IS NULL on a column with zero nulls prunes everything
    rdr, _ = _reader_for(spark, path, [IsNull(("v",))])
    assert len(rdr.partitions()) == 0

    # end-to-end through Spark: filtered DSv2 read == cowtable.read
    got = {tuple(r) for r in _read(spark, path).filter("k < 25 AND v = '3'").collect()}
    want = {
        tuple(r) for r in cow.read(spark, path).filter("k < 25 AND v = '3'").collect()
    }
    assert got == want and got


def test_pushdown_is_sound_after_rename_and_unknown_types(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo

    path = str(tmp_path / "prune_ren")
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
    )
    cow.alter_rename_column(spark, path, "v", "w")
    register_cow_batch(spark)
    # predicate on the RENAMED column must probe the physical stats
    rdr, _ = _reader_for(spark, path, [EqualTo(("w",), "zzz")])
    assert len(rdr.partitions()) == 0  # stats prove absent
    got = {tuple(r) for r in _read(spark, path).filter("w = 'a'").collect()}
    assert got == {(1, "a")}
    # a literal type with no stats representation declines to prune
    total = len(_reader_for(spark, path, [])[0].partitions())
    rdr, _ = _reader_for(
        spark, path, [EqualTo(("k",), datetime.datetime(2020, 1, 1))]
    )
    assert len(rdr.partitions()) == total


def test_pushdown_matcher_pinned_against_cowtable(spark):
    """Randomized agreement: the DataSource's self-contained matcher
    must decide identically to cowtable._file_may_match on arbitrary
    entries and conjuncts (including bloom probes, which exercise the
    duplicated XXH64)."""
    import base64
    import random

    from data_warehouse_solution_spark.cowtable import (
        _bloom_positions,
        _file_may_match,
    )
    from data_warehouse_solution_spark.sources.cow_batch import CowBatchDataSource

    rng = random.Random(77)
    m_bits, k_hash = 256, 3

    def bloom_of(values):
        bitmap = bytearray(m_bits // 8)
        for v in values:
            for p in _bloom_positions(str(v), m_bits, k_hash):
                bitmap[p >> 3] |= 1 << (p & 7)
        return {"b64": base64.b64encode(bytes(bitmap)).decode(), "m": m_bits, "k": k_hash}

    types = {"a": "bigint", "s": "string"}
    for trial in range(300):
        lo = rng.randrange(-50, 50)
        hi = lo + rng.randrange(0, 60)
        svals = rng.sample(["x", "y", "z", "w", "q"], rng.randrange(1, 4))
        rows = rng.randrange(1, 100)
        entry = {
            "rows": rows,
            "stats": {"a": [lo, hi], "s": [min(svals), max(svals)]},
            "nulls": {"a": rng.choice([0, rows // 2, rows]), "s": 0},
        }
        if rng.random() < 0.6:
            entry["blooms"] = {
                "a": bloom_of(range(lo, hi + 1)),
                "s": bloom_of(svals),
            }
        conjs = []
        for _ in range(rng.randrange(1, 4)):
            col = rng.choice(["a", "s"])
            if col == "a":
                op = rng.choice(["=", "<", "<=", ">", ">=", "in", "isnull", "notnull"])
                val = (
                    [rng.randrange(-60, 120) for _ in range(2)]
                    if op == "in"
                    else None if op in ("isnull", "notnull") else rng.randrange(-60, 120)
                )
            else:
                op = rng.choice(["=", "in"])
                val = (
                    rng.sample(["x", "y", "z", "nope", "q"], 2)
                    if op == "in"
                    else rng.choice(["x", "y", "z", "nope"])
                )
            conjs.append((col, op, val))
        want = _file_may_match(entry, conjs, types)
        got = CowBatchDataSource._entry_may_match(entry, conjs, types)
        assert got == want, (trial, entry, conjs)


def test_reader_bucket_pruning_parity_and_correctness(spark, tmp_path):
    """The DSv2 reader mirrors the engine's bucket pruning: a point
    SELECT over a bucketed table emits only the key's bucket's
    partitions (local Murmur3, parity-pinned vs the engine's), and
    the residual filter keeps results exact."""
    import data_warehouse_solution_spark.cowtable as cow
    from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch

    p = str(tmp_path / "bkt_read")
    cow.create(
        spark,
        p,
        spark.range(400).selectExpr("id AS k", "id * 2 AS v"),
        bucket_by=["k"],
        num_buckets=8,
    )
    register_cow_batch(spark)
    df = spark.read.format("cow").option("tablePath", p).load().filter("k = 123")
    got = df.collect()
    assert [tuple(r) for r in got] == [(123, 246)]
    # partition count: exactly the one bucket's file(s)
    from data_warehouse_solution_spark.sources.cow_batch import CowBatchDataSource

    rd = CowBatchDataSource({"tablePath": p})._reader_cls(
        spark.read.format("cow").option("tablePath", p).load().schema,
        {"tablepath": p},
    )
    rd.pushFilters  # exists
    rd.conjuncts = [("k", "=", 123)]
    parts = rd.partitions()
    assert len(parts) == 1
    want = cow._bucket_of_key([123], ["bigint"], 8)
    assert f"_{want:05d}.parquet" in parts[0].name
    # IN-list prunes to the union of buckets
    rd.conjuncts = [("k", "in", (5, 6, 7))]
    want_set = {cow._bucket_of_key([x], ["bigint"], 8) for x in (5, 6, 7)}
    got_buckets = {
        int(pp.name.rsplit("_", 1)[-1].split(".")[0]) for pp in rd.partitions()
    }
    assert got_buckets == want_set


def test_name_addressed_sources_all_routes(spark, tmp_path):
    """r11 punch #5: ``option("table", name)`` on the batch
    reader/writer and the cowcdc/cowsink streams resolves a
    catalog-registered name (with ``catalogDir`` pointing at the
    session's overridden catalog) — no route mentions a path; unknown
    names raise with the registered-table list; the sources' mirror
    resolver stays pinned against ``catalog.resolve``."""
    import uuid

    from data_warehouse_solution_spark import catalog
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc
    from data_warehouse_solution_spark.sources.cow_sink import register_cow_sink

    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    cat_dir = str(tmp_path / "_catalog")
    spark.conf.set("spark.dws.cow.catalogDir", cat_dir)
    try:
        p = str(tmp_path / "named_src")
        cow.create(
            spark, p, spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        )
        name = f"lake.named_{uuid.uuid4().hex[:8]}"
        catalog.register(spark, name, p)
        register_cow_batch(spark)
        register_cow_cdc(spark)
        register_cow_sink(spark)

        # mirror parity: the source resolves exactly what catalog.resolve says
        assert catalog.resolve(spark, name) == p

        # route 1: batch read by name
        rd = (
            spark.read.format("cow")
            .option("table", name)
            .option("catalogDir", cat_dir)
            .load()
        )
        assert sorted(r.k for r in rd.collect()) == [1, 2]

        # route 2: batch WRITE by name (append 1 row), read back
        (
            spark.createDataFrame([(3, "c")], "k long, v string")
            .write.format("cow")
            .option("table", name)
            .option("catalogDir", cat_dir)
            .mode("append")
            .save()
        )
        assert cow.read(spark, p).count() == 3

        # route 3: cowcdc stream by name (replay all), memory sink
        q = (
            spark.readStream.format("cowcdc")
            .option("table", name)
            .option("catalogDir", cat_dir)
            .option("startingSnapshot", "0")
            .load()
            .writeStream.format("memory")
            .queryName("named_cdc_route")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql(
            "SELECT k, _change_type FROM named_cdc_route ORDER BY k"
        ).collect()
        assert [(r.k, r._change_type) for r in got] == [
            (1, "insert"),
            (2, "insert"),
            (3, "insert"),
        ]

        # route 4: cowsink stream by name
        src_dir = str(tmp_path / "sink_feed")
        cow.create(
            spark, src_dir, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        q = (
            spark.readStream.format("cowcdc")
            .option("tablePath", src_dir)
            .option("startingSnapshot", "0")
            .load()
            .select("k", "v")
            .writeStream.format("cowsink")
            .option("table", name)
            .option("catalogDir", cat_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert cow.read(spark, p).count() == 4

        # unknown name: raises listing the registered tables
        with pytest.raises(Exception, match="registered tables"):
            (
                spark.read.format("cow")
                .option("table", "lake.nope")
                .option("catalogDir", cat_dir)
                .load()
                .collect()
            )
        catalog.unregister(spark, name)
    finally:
        if old is None:
            spark.conf.unset("spark.dws.cow.catalogDir")
        else:
            spark.conf.set("spark.dws.cow.catalogDir", old)
