"""ANN recall@k floors (r12, VERDICT r11 punch #3): the approximate
variants' recall at their PRODUCTION settings is now a measured,
tripwired number — the codec-bandwidth pattern. tools/ann_recall.py
prints the numbers (recorded in SCALE.md at sf0.1); this test pins
floors at the deterministic sf0.01 values so any algorithm change
that silently degrades search quality fails loudly. The fixture
embeddings are near-isotropic (documented in ann_ivfpq_topk), so the
absolute numbers are modest by construction — the floor protects the
MECHANISM (probing, banding, ADC ranking), not a marketing number:
at nprobe = all cells the compositions are separately pinned
LOSSLESS by tests/test_pq.py.
"""

from __future__ import annotations

from .conftest import SF_ORACLE

# deterministic at a fixed fixture + settings (rounded sims, id
# tiebreaks, deterministic kmeans init) — measured by
# tools/ann_recall.py at sf0.01: lsh 0.52, ivf 0.12, ivfpq 0.42
# (ivfpq residual-coded since r14 — raw coding measured 0.40)
FLOORS = {"lsh": 0.50, "ivf": 0.10, "ivfpq": 0.38}


def test_ann_recall_floors(spark):
    from tools.ann_recall import measure

    got = measure(spark, SF_ORACLE)
    for name, floor in FLOORS.items():
        r = got["recall"][name]
        assert r >= floor, (
            f"{name} recall@{got['top_k']} regressed: {r} < floor {floor} "
            f"(settings: {got['settings'][name]})"
        )
        assert r <= 1.0


# clustered counter-demonstration (r13, VERDICT r12 punch #2): on a
# corpus WITH latent mixture structure (clustered_embeddings — 10
# xxhash64-derived centers + 0.2 noise over the fixture's vec_ids),
# the SAME routers at production nprobe must recover the exact top-10
# — measured at sf0.01: ivf_nprobe1 1.0, ivfpq_nprobe2 0.84
CLUSTERED_FLOORS = {"ivf_nprobe1": 0.8, "ivfpq_nprobe2": 0.8}


def test_ann_clustered_recall_floors(spark):
    from data_warehouse_solution_spark.operators.similarity import (
        ann_ivf_recall_clustered,
    )

    rows = {
        r["variant"]: r["recall_at_k"]
        for r in ann_ivf_recall_clustered(spark, SF_ORACLE).collect()
    }
    assert set(rows) == set(CLUSTERED_FLOORS)
    for name, floor in CLUSTERED_FLOORS.items():
        assert floor <= rows[name] <= 1.0, (
            f"{name} clustered recall@10 regressed: {rows[name]} < {floor} "
            "— the router no longer recovers structure that EXISTS"
        )
