"""Properties of the graph / profiling / streaming-matview operators
beyond their registry value-oracles."""

from __future__ import annotations

from data_warehouse_solution_spark.operators.graph import graph_pagerank_transitions
from data_warehouse_solution_spark.operators.profiling import profile_table_columns
from data_warehouse_solution_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_pagerank_mass_and_positivity(spark):
    rows = graph_pagerank_transitions(spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.pagerank for r in rows)
    assert all(r.pagerank > 0 for r in rows)
    # dangling nodes may leak mass; never create it
    assert total <= 1.0 + 1e-9
    assert total > 0.5  # the transition graph is well-connected here


def test_profile_matches_table_facts(spark):
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    n = o.count()
    prof = {r.col_name: r for r in profile_table_columns(spark, SF_SMOKE).collect()}
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    # orderkey is a unique non-null key
    assert prof["o_orderkey"].n_nulls == 0
    assert prof["o_orderkey"].n_distinct == n
    # string columns carry string min/max, numeric slots empty
    assert prof["o_orderstatus"].min_str is not None
    assert prof["o_orderstatus"].min_num is None
    assert prof["o_totalprice"].min_num is not None
    assert prof["o_totalprice"].min_str is None


def test_stream_and_batch_matview_converge_identically(spark):
    """The streaming fold and the batch CDC fold must produce the
    same view (same DML script, same maintenance algebra)."""
    from data_warehouse_solution_spark.operators.matview import matview_incremental_cdc
    from data_warehouse_solution_spark.streaming.streams import (
        stream_matview_maintenance,
    )

    batch = {
        (r.o_orderpriority, r.n_orders, round(r.total_price, 2))
        for r in matview_incremental_cdc(spark, SF_SMOKE).collect()
    }
    streamed = {
        (r.o_orderpriority, r.n_orders, round(r.total_price, 2))
        for r in stream_matview_maintenance(spark, SF_SMOKE).collect()
    }
    assert batch == streamed


def test_minmax_maintenance_paths(spark):
    """Cheap-merge and group-scoped-recompute paths of
    maintain_view_minmax, on hand-built frames: g1 gets an insert
    only (extends MAX without base access); g2's delete removes its
    stored MIN (forces re-aggregation from base)."""
    from data_warehouse_solution_spark.operators.matview import maintain_view_minmax

    view = spark.createDataFrame(
        [("g1", 2, 1.0, 5.0), ("g2", 2, 10.0, 20.0)],
        "g string, n_orders long, min_v double, max_v double",
    )
    changes = spark.createDataFrame(
        [
            ("g1", 7.0, "insert"),
            ("g2", 10.0, "delete"),
            ("g2", 15.0, "insert"),
        ],
        "g string, v double, _change_type string",
    )
    base = spark.createDataFrame(
        [("g1", 1.0), ("g1", 5.0), ("g1", 7.0), ("g2", 15.0), ("g2", 20.0)],
        "g string, v double",
    )
    out = {
        r.g: (r.n_orders, r.min_v, r.max_v)
        for r in maintain_view_minmax(view, changes, base, "g", "v").collect()
    }
    assert out == {"g1": (3, 1.0, 7.0), "g2": (2, 15.0, 20.0)}
