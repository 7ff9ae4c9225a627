"""IVFPQ composition invariants (`operators.pq.ann_ivfpq_topk`):

1. the ADC stage must reach the coded corpus through a keyed
   equi-join on the cluster id — never a cross/nested-loop join
   (the flat-PQ full scan is the thing IVFPQ exists to remove);
2. the scanned-code volume per query is bounded by the probed cells;
3. the composition is LOSSLESS apart from routing: probing ALL cells
   must reproduce flat PQ's top-k exactly (same codebooks, same ADC,
   same tie-breaks), so any recall delta is attributable to nprobe
   alone — which matters because the fixture embeddings are nearly
   isotropic and no router can beat probe-proportional coverage on
   them (measured in the operator docstring).
"""

from __future__ import annotations

from data_warehouse_solution_spark.operators.pq import (
    IVF_CELLS,
    NPROBE,
    _ivfpq_topk,
    ann_ivfpq_topk,
    ann_pq_topk,
)
from data_warehouse_solution_spark.plans import executed_plan

from .conftest import SF_SMOKE


def test_ivfpq_scoring_is_keyed_join_not_scan(spark):
    df = _ivfpq_topk(spark, SF_SMOKE, nprobe=NPROBE)
    plan = executed_plan(df)
    # the only allowed nested-loop shapes are the broadcast query-set
    # joins of the re-rank/recall stages; the ADC scoring join on the
    # cluster id must be an equi-join. A CartesianProduct anywhere
    # means the coded corpus is being scanned per query again.
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_scans_only_probed_cells(spark):
    rows = _ivfpq_topk(spark, SF_SMOKE, nprobe=1).collect()
    # with 1 of 10 cells probed, no query may see candidates from
    # more than one cell — and recall must be strictly below 1.0 for
    # at least some query on this isotropic fixture (if it were 1.0
    # everywhere the query would have to be scanning the corpus)
    recalls = {r["q_id"]: r["recall_at_k"] for r in rows}
    assert len(recalls) > 0
    assert min(recalls.values()) < 1.0


def test_ivfpq_with_full_probing_equals_flat_pq(spark):
    # routing losslessness is pinned on the RAW-coded variant: flat PQ
    # has no cells to residualize against, so only raw coding shares
    # its codes — production (r14) defaults to residual coding, whose
    # nprobe=all behavior is pinned by the test below instead
    flat = {
        (r["q_id"], r["rnk"]): r["n_id"] for r in ann_pq_topk(spark, SF_SMOKE).collect()
    }
    full = {
        (r["q_id"], r["rnk"]): r["n_id"]
        for r in _ivfpq_topk(
            spark, SF_SMOKE, nprobe=IVF_CELLS, by_residual=False
        ).collect()
    }
    assert flat == full


def test_ivfpq_residual_full_probing_not_worse_than_raw(spark):
    # r14 (production default flipped to by_residual): at nprobe=all
    # the residual-coded ADC must recall at least as well as raw codes
    # (deterministic fixture + seeded training: measured 0.76 vs 0.74
    # at sf0.001) — residual coding spends codebook resolution on
    # within-cell geometry, so it can only help or tie
    def mean_recall(by_residual):
        rows = _ivfpq_topk(
            spark, SF_SMOKE, nprobe=IVF_CELLS, by_residual=by_residual
        ).collect()
        rs = [r["recall_at_k"] for r in rows]
        return sum(rs) / len(rs)

    assert mean_recall(True) >= mean_recall(False)


def test_ivfpq_default_recall_floor(spark):
    # the PRODUCTION query (residual-coded, r14)
    rows = ann_ivfpq_topk(spark, SF_SMOKE).collect()
    recalls = [r["recall_at_k"] for r in rows]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=2 of 10 on the isotropic fixture: coverage ceiling ~0.42
    # (docstring measurement; residual-coded 0.48 at sf0.001); the
    # achieved mean should sit near it, far above the 0.2 random floor
    assert mean_recall >= 0.25, mean_recall
