"""Unit properties of the deterministic mergeable sketches
(``operators/sketches.py``) beyond the registry's value-oracle
equality: estimator accuracy, the CMS one-sided-error guarantee, and
the HLL merge law exercised through the library surface on an
arbitrary shard split (the registered query fixes shard = key % 8;
here the split is by an unrelated column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_solution_spark.operators.sketches import (
    hll_merge_estimate,
    hll_partials,
    sketch_countmin_heavy_hitters,
    sketch_hll_mergeable,
)
from data_warehouse_solution_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_hll_estimate_accuracy(spark):
    rows = sketch_hll_mergeable(spark, SF_SMOKE).collect()
    assert rows, "no groups"
    for r in rows:
        rel = abs(r.hll_estimate - r.n_exact) / max(r.n_exact, 1)
        # p=12 + linear-counting small-range correction: a few percent
        assert rel < 0.10, f"{r.l_returnflag}: est {r.hll_estimate} vs {r.n_exact}"


def test_hll_merge_law_arbitrary_split(spark):
    """Register-wise MAX of per-shard partials must equal the sketch
    built in one pass — regardless of how rows are sharded. Shard by a
    column UNRELATED to the hashed key (suppkey parity) and compare
    against the unsharded build."""
    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"].select(
        "l_returnflag", "l_orderkey", "l_suppkey"
    )
    sharded = li.withColumn("shard", F.col("l_suppkey") % 2)
    merged = hll_merge_estimate(
        hll_partials(sharded, "l_orderkey", ["l_returnflag", "shard"]),
        ["l_returnflag"],
    )
    direct = hll_merge_estimate(
        hll_partials(li, "l_orderkey", ["l_returnflag"]), ["l_returnflag"]
    )
    got = {r.l_returnflag: r.hll_estimate for r in merged.collect()}
    want = {r.l_returnflag: r.hll_estimate for r in direct.collect()}
    assert got == want


def test_cms_estimates_are_one_sided(spark):
    rows = sketch_countmin_heavy_hitters(spark, SF_SMOKE).collect()
    assert rows, "no heavy hitters at smoke SF"
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt, (
            f"CMS under-counted {r.l_suppkey}: {r.cms_estimate} < {r.exact_cnt}"
        )
    # d=3 x w=1024 over ~100 keys: collisions should stay moderate —
    # the estimate is not allowed to be arbitrarily inflated either
    worst = max(r.cms_estimate - r.exact_cnt for r in rows)
    total = sum(r.exact_cnt for r in rows)
    assert worst <= max(50, total // 10)


def test_bm25_ranking_is_wellformed(spark):
    from data_warehouse_solution_spark.operators.retrieval import text_bm25_topk

    rows = sorted(text_bm25_topk(spark, SF_SMOKE).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_hybrid_ivf_matches_bruteforce_exactly(spark):
    """nprobe=all IVF routing must not change the hybrid retriever's
    answer: the cell-routed semantic side scores the same vectors as
    the flat scan, so the fused top-10 (ids, ranks, scores) must be
    identical row-for-row."""
    from data_warehouse_solution_spark.operators.retrieval import (
        hybrid_rrf_retrieval,
        hybrid_rrf_retrieval_ivf,
    )

    brute = sorted(map(tuple, hybrid_rrf_retrieval(spark, SF_SMOKE).collect()))
    ivf = sorted(map(tuple, hybrid_rrf_retrieval_ivf(spark, SF_SMOKE).collect()))
    assert brute == ivf
    assert len(brute) == 10


def test_matview_new_group_appears_and_drops(spark):
    """The maintained view must contain the appended 9-EXPRESS group
    (absent from the base data) with exactly the appended rows."""
    from data_warehouse_solution_spark.operators.matview import matview_incremental_cdc

    rows = {r.o_orderpriority: r for r in matview_incremental_cdc(spark, SF_SMOKE).collect()}
    assert "9-EXPRESS" in rows
    assert rows["9-EXPRESS"].n_orders == 2
    assert abs(rows["9-EXPRESS"].total_price - 334.0) < 1e-9


def test_quantile_histogram_accuracy_within_bin_width(spark):
    from data_warehouse_solution_spark.operators.sketches import (
        _QW,
        sketch_quantile_histogram,
    )

    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"]
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    width = (hi - lo) / _QW
    exact = {
        (r.l_returnflag, q): v
        for q in (0.5, 0.9)
        for r, v in [
            (row, row[f"p{q}"])
            for row in li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile(l_extendedprice, {q})").alias(f"p{q}"))
            .collect()
        ]
    }
    for r in sketch_quantile_histogram(spark, SF_SMOKE).collect():
        err = abs(r.est_value - exact[(r.l_returnflag, r.q)])
        assert err <= width, (r.l_returnflag, r.q, err, width)
