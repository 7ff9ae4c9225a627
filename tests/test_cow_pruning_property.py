"""Property test for the COW manifest-stat pruner: SOUNDNESS.

`stats_candidate_files` may over-approximate (keep files the exact
scan later clears) but must NEVER drop a file that contains a
matching row — a pruned-away match would silently corrupt DML. The
property: for random rows partitioned into random 'files' (stats =
exact per-file min/max) and random supported conjunction predicates,
every file holding >=1 row satisfying the predicate appears in the
candidate list. Pure Python — no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_warehouse_solution_spark.cowtable import stats_candidate_files

_OPS = ["=", "<", "<=", ">", ">="]


def _py_eval(row: dict, col: str, op: str, val) -> bool:
    x = row[col]
    if op == "=":
        return x == val
    if op == "<":
        return x < val
    if op == "<=":
        return x <= val
    if op == ">":
        return x > val
    return x >= val


rows_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "k": st.integers(min_value=-1000, max_value=1000),
            "v": st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
            "s": st.text(alphabet="abcxyz", min_size=0, max_size=4),
        }
    ),
    min_size=1,
    max_size=60,
)

conjuncts_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k", "v", "s"]),
        st.sampled_from(_OPS),
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=200, deadline=None)
@given(
    rows=rows_strategy,
    n_files=st.integers(min_value=1, max_value=5),
    conjunct_shapes=conjuncts_strategy,
    data=st.data(),
)
def test_pruner_never_drops_a_matching_file(rows, n_files, conjunct_shapes, data):
    # partition rows round-robin into "files" with exact min/max stats
    files = []
    for i in range(n_files):
        chunk = rows[i::n_files]
        if not chunk:
            continue
        stats = {
            c: [min(r[c] for r in chunk), max(r[c] for r in chunk)] for c in ("k", "v", "s")
        }
        files.append({"name": f"f{i}", "rows": len(chunk), "stats": stats, "_rows": chunk})
    manifest = {"files": files}

    # build the predicate string + its python evaluator
    parts = []
    evals = []
    for col, op in conjunct_shapes:
        if col == "k":
            val = data.draw(st.integers(min_value=-1000, max_value=1000))
            lit = str(val)
        elif col == "v":
            val = float(data.draw(st.integers(min_value=-1000, max_value=1000)))
            lit = f"{val:.1f}"
        else:
            val = data.draw(st.text(alphabet="abcxyz", min_size=0, max_size=4))
            lit = f"'{val}'"
        parts.append(f"{col} {op} {lit}")
        evals.append((col, op, val))
    condition = " AND ".join(parts)

    kept = {f["name"] for f in stats_candidate_files(manifest, condition)}
    for f in files:
        has_match = any(all(_py_eval(r, c, o, v) for c, o, v in evals) for r in f["_rows"])
        if has_match:
            assert f["name"] in kept, (condition, f["stats"])


def test_separator_inside_string_literal_disables_pruning():
    """A quoted literal containing ' AND ' must not fabricate
    conjuncts (the naive split would extract "k = 3" below and prune
    on a condition the predicate never implied)."""
    manifest = {
        "files": [
            {"name": "f0", "rows": 1, "stats": {"k": [7, 7], "s": ["a AND k = 3 AND b", "a AND k = 3 AND b"]}}
        ]
    }
    cond = "s = 'a AND k = 3 AND b'"
    kept = {f["name"] for f in stats_candidate_files(manifest, cond)}
    assert kept == {"f0"}  # row k=7 matches the real predicate; file must survive
