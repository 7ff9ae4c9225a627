"""Distributed k-means trainer: Lloyd's invariants (non-increasing
inertia, full coverage, convergence) on the embeddings fixture."""

from __future__ import annotations

from data_warehouse_solution_spark.operators.kmeans import (
    assign_clusters,
    train_ivf_index,
    train_kmeans,
)

from .conftest import SF_SMOKE


def test_kmeans_inertia_non_increasing(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    centroids, trace = train_kmeans(spark, e, k=4, max_iters=6)
    assert len(centroids) == 4
    assert all(len(c) == 64 for c in centroids)
    assert len(trace) >= 2
    for prev, nxt in zip(trace, trace[1:]):
        assert nxt <= prev + 1e-6, trace  # Lloyd's guarantee


def test_kmeans_assignment_covers_all_vectors(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    centroids, _ = train_kmeans(spark, e, k=4, max_iters=4)
    assigned = assign_clusters(e.select("vec_id", "embedding"), centroids)
    assert assigned.count() == e.count()
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(4))
    assert len(clusters) >= 2  # fixture has >= 2 separable groups


def test_ivf_index_deterministic(spark):
    a = {(r["vec_id"], r["cluster"]) for r in train_ivf_index(spark, SF_SMOKE, k=4, max_iters=3).collect()}
    b = {(r["vec_id"], r["cluster"]) for r in train_ivf_index(spark, SF_SMOKE, k=4, max_iters=3).collect()}
    assert a == b


def test_pq_encode_and_recall(spark):
    """PQ codes are in range, encoding is deterministic, and the
    ADC-shortlist + exact-re-rank search recovers a usable fraction
    of the true top-k (64-bit codes on 64-dim vectors: recall well
    above the 10%-random floor)."""
    from data_warehouse_solution_spark.operators.pq import (
        PQ_K,
        PQ_M,
        ann_pq_topk,
        pq_encode,
        train_pq_codebooks,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    books = train_pq_codebooks(spark, e)
    assert len(books) == PQ_M and all(len(b) == PQ_K for b in books)
    codes = pq_encode(e.select("vec_id", "embedding"), books)
    p = codes.toPandas()
    for m in range(PQ_M):
        assert p[f"code_{m}"].between(0, PQ_K - 1).all()
    p2 = pq_encode(e.select("vec_id", "embedding"), books).toPandas()
    assert p.sort_values("vec_id").reset_index(drop=True).equals(
        p2.sort_values("vec_id").reset_index(drop=True)
    )

    out = ann_pq_topk(spark, SF_SMOKE).toPandas()
    assert set(out.columns) == {"q_id", "n_id", "label", "adc_dist", "d2", "rnk"} | {
        "recall_at_k"
    }
    mean_recall = out.groupby("q_id").recall_at_k.first().mean()
    assert mean_recall >= 0.3, mean_recall
