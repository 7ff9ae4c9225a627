"""Property test: CDC view maintenance == full recompute, for RANDOM
DML sequences. The registered matview queries pin one scripted
sequence; here hypothesis drives arbitrary append/delete/update
chains against a COW table and asserts BOTH maintenance algebras
(signed-delta SUM/COUNT and partial-recompute MIN/MAX) reconstruct
exactly the aggregate of the final table state."""

from __future__ import annotations

import os
import tempfile

from .conftest import hyp_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.operators.matview import (
    maintain_view,
    maintain_view_minmax,
)

_GROUPS = ("a", "b", "c")

_row = st.tuples(
    st.integers(min_value=0, max_value=20),
    st.sampled_from(_GROUPS),
    st.integers(min_value=-500, max_value=500).map(lambda c: c / 100.0),
)
_rows = st.lists(_row, min_size=1, max_size=12)

_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("delete"), st.sampled_from(_GROUPS), st.integers(-400, 400)),
    st.tuples(st.just("update"), st.integers(2, 7), st.integers(-300, 300)),
)


@settings(
    max_examples=hyp_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(initial=_rows, ops=st.lists(_op, min_size=1, max_size=4))
def test_maintenance_equals_recompute(spark, initial, ops):
    work = tempfile.mkdtemp(prefix="dws_mvprop_")
    path = os.path.join(work, "t")
    try:
        _run_example(spark, path, initial, ops)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _run_example(spark, path, initial, ops):

    def df(rows):
        return spark.createDataFrame(rows, "k long, grp string, v double")

    s0 = cow.create(spark, path, df(initial))
    base0 = cow.read(spark, path, snapshot=s0)
    view_sum0 = base0.groupBy(F.col("grp").alias("g")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("price_sum"),
    ).localCheckpoint(eager=True)
    view_mm0 = base0.groupBy(F.col("grp").alias("g")).agg(
        F.count("*").alias("n_orders"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ).localCheckpoint(eager=True)

    for op in ops:
        if op[0] == "append":
            cow.append(spark, path, df(op[1]))
        elif op[0] == "delete":
            cow.delete(spark, path, f"grp = '{op[1]}' AND v < {op[2] / 100.0}")
        else:
            cow.update(spark, path, f"k % {op[1]} = 0", {"v": f"v + {op[2] / 100.0}"})

    ch = cow.changes(spark, path, from_snapshot=s0).withColumnRenamed("grp", "g")
    final = cow.read(spark, path)

    maintained_sum = {
        (r.g, r.n_orders, round(float(r.price_sum), 2))
        for r in maintain_view(view_sum0, ch, "g", "v").collect()
    }
    expect_sum = {
        (r.grp, r.n, round(float(r.s), 2))
        for r in final.groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    assert maintained_sum == expect_sum

    maintained_mm = {
        (r.g, r.n_orders, r.min_v, r.max_v)
        for r in maintain_view_minmax(
            view_mm0, ch, final.withColumnRenamed("grp", "g"), "g", "v"
        ).collect()
    }
    expect_mm = {
        (r.grp, r.n, r.lo, r.hi)
        for r in final.groupBy("grp")
        .agg(F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert maintained_mm == expect_mm


_nullable_row = st.tuples(
    st.integers(min_value=0, max_value=20),
    st.sampled_from(_GROUPS),
    st.one_of(
        st.none(),
        st.integers(min_value=-500, max_value=500).map(lambda c: c / 100.0),
    ),
    st.integers(min_value=-100, max_value=100),
)
_nullable_rows = st.lists(_nullable_row, min_size=1, max_size=12)

_op2 = st.one_of(
    st.tuples(st.just("append"), _nullable_rows),
    st.tuples(st.just("delete"), st.sampled_from(_GROUPS), st.integers(-400, 400)),
    st.tuples(st.just("update"), st.integers(2, 7), st.integers(-300, 300)),
)


@settings(
    max_examples=hyp_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(initial=_nullable_rows, ops=st.lists(_op2, min_size=1, max_size=4))
def test_generalized_fold_equals_recompute(spark, initial, ops):
    # r14: the SQL matview surface's generalized maintain_aggregates
    # (COUNT(*)/COUNT(col)/SUM/MIN/MAX/AVG + hidden counters) must
    # reconstruct full_aggregate of the final state for RANDOM DML,
    # including NULL measure values (nn counters), group death, and
    # deletes that strike stored extremes (recompute split)
    work = tempfile.mkdtemp(prefix="dws_mvgprop_")
    path = os.path.join(work, "t")
    try:
        _run_generalized(spark, path, initial, ops)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _run_generalized(spark, path, initial, ops):
    from data_warehouse_solution_spark.operators.matview import (
        full_aggregate,
        maintain_aggregates,
    )

    AGGS = [
        {"kind": "count", "col": None, "alias": "n"},
        {"kind": "count_col", "col": "v", "alias": "nv"},
        {"kind": "sum", "col": "w", "alias": "sw"},
        {"kind": "min", "col": "v", "alias": "lo"},
        {"kind": "max", "col": "v", "alias": "hi"},
        {"kind": "avg", "col": "v", "alias": "av"},
    ]

    def df(rows):
        return spark.createDataFrame(
            rows, "k long, grp string, v double, w long"
        )

    def norm(frame):
        out = set()
        for r in frame.select("grp", "n", "nv", "sw", "lo", "hi", "av").collect():
            av = None if r.av is None else round(float(r.av), 6)
            out.add((r.grp, r.n, r.nv, r.sw, r.lo, r.hi, av))
        return out

    s0 = cow.create(spark, path, df(initial))
    view0 = full_aggregate(
        cow.read(spark, path, snapshot=s0), ["grp"], AGGS
    ).localCheckpoint(eager=True)
    for op in ops:
        if op[0] == "append":
            cow.append(spark, path, df(op[1]))
        elif op[0] == "delete":
            cow.delete(spark, path, f"grp = '{op[1]}' AND v < {op[2] / 100.0}")
        else:
            cow.update(spark, path, f"k % {op[1]} = 0", {"w": f"w + {op[2]}"})
    ch = cow.changes(spark, path, from_snapshot=s0)
    final = cow.read(spark, path)
    maintained = maintain_aggregates(view0, ch, final, ["grp"], AGGS)
    assert norm(maintained) == norm(full_aggregate(final, ["grp"], AGGS))
