"""Property test: a COW table under RANDOM interleavings of partition
evolution and DML stays content-equal to a plain relational model.
The registered `cow_partition_evolution` query pins one scripted
sequence; here hypothesis drives arbitrary
add-field/drop-field/insert/delete/update/compact chains and asserts
after EVERY step that the table reads back exactly what the model
holds — layout changes must never change content, whatever order
they land in and however many spec vintages coexist."""

from __future__ import annotations

import os
import shutil
import tempfile

from .conftest import hyp_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import data_warehouse_solution_spark.cowtable as cow

_COLS = "k long, region string, prio string, v long"
_FIELDS = ("region", "prio")

_row = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from(["r0", "r1", "r2"]),
    st.sampled_from(["p0", "p1"]),
    st.integers(min_value=-100, max_value=100),
)
_rows = st.lists(_row, min_size=1, max_size=8)

_op = st.one_of(
    st.tuples(st.just("add"), st.sampled_from(_FIELDS)),
    st.tuples(st.just("drop"), st.sampled_from(_FIELDS)),
    st.tuples(st.just("insert"), _rows),
    st.tuples(st.just("delete"), st.sampled_from(["r0", "r1"]), st.sampled_from(["p0", "p1"])),
    st.tuples(st.just("update"), st.integers(min_value=2, max_value=5)),
    st.tuples(st.just("compact"), st.just(None)),
)


def _read_sorted(spark, path):
    return sorted(map(tuple, cow.read(spark, path).collect()))


@settings(
    max_examples=hyp_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(initial=_rows, ops=st.lists(_op, min_size=1, max_size=5))
def test_evolution_never_changes_content(spark, initial, ops):
    work = tempfile.mkdtemp(prefix="dws_evoprop_")
    path = os.path.join(work, "t")
    try:
        model = list(initial)
        cow.create(
            spark,
            path,
            spark.createDataFrame(initial, _COLS).coalesce(2),
            partition_by=["region"],
        )
        fields = ["region"]
        for op in ops:
            kind = op[0]
            if kind == "add":
                col = op[1]
                if col in fields:
                    continue
                cow.alter_add_partition_field(spark, path, col)
                fields.append(col)
            elif kind == "drop":
                col = op[1]
                if col not in fields:
                    continue
                cow.alter_drop_partition_field(spark, path, col)
                fields.remove(col)
            elif kind == "insert":
                rows = op[1]
                cow.append(spark, path, spark.createDataFrame(rows, _COLS))
                model += rows
            elif kind == "delete":
                region, prio = op[1], op[2]
                cow.delete(spark, path, f"region = '{region}' AND prio = '{prio}'")
                model = [r for r in model if not (r[1] == region and r[2] == prio)]
            elif kind == "update":
                mod = op[1]
                cow.update(spark, path, f"k % {mod} = 0", {"v": "v + 1000"})
                model = [
                    (r[0], r[1], r[2], r[3] + 1000) if r[0] % mod == 0 else r
                    for r in model
                ]
            else:
                cow.compact(spark, path, target_files=2)
            # content == model after EVERY step, across every
            # coexisting spec vintage
            assert _read_sorted(spark, path) == sorted(model), (kind, fields)
            m = cow._load_manifest(spark, path, cow.current_snapshot(spark, path))
            assert m["partition_by"] == fields
        # the end state also survives a final full-migration compact
        cow.compact(spark, path, target_files=2)
        assert _read_sorted(spark, path) == sorted(model)
        m = cow._load_manifest(spark, path, cow.current_snapshot(spark, path))
        assert {cow._part_keys(f["name"]) for f in m["files"]} <= {tuple(fields)}
    finally:
        shutil.rmtree(work, ignore_errors=True)
