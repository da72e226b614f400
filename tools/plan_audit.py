"""Plan auditor: the scale-health checklist, mechanized.

For each headline query (or names passed as argv), prints the signals
that decide whether a plan survives a 100x scale-up:

  * exchanges   — shuffle count (every one is a full network pass at scale)
  * bnlj        — BroadcastNestedLoopJoin (cartesian; always a bug here)
  * codegen     — WholeStageCodegen span count vs CodegenFallback-heavy ops
  * pushed      — parquet scans with PushedFilters / pruned ReadSchema
  * pyops       — Arrow/python stages (the allowed UDF surface; row-at-a-
                  time PythonUDF in a hot path would show up as BatchEvalPython)

Usage: python tools/plan_audit.py [query ...]
Scale dir via $SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not perf).

Caveat: the plan STRING reprints a cached relation's full lineage under
every InMemoryTableScan consumer, so shuffle/scan counts for persisted
pipelines (dedup_*) are upper bounds on the executed stage graph; the
cartesian / row-python-UDF flags are exact either way.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def audit(plan: str) -> dict[str, object]:
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = sum(
        1 for s in scans if "PushedFilters: [" in s and "PushedFilters: []" not in s
    )
    return {
        # \bExchange\b does not match inside BroadcastExchange (no word
        # boundary after 'Broadcast'), so this is the shuffle count alone
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        # Cross-mode BNLJ is the deliberate one-row LUT crossJoin pattern
        # (index/_util.attach_lut — the py4j-literal-tax fix); any OTHER
        # join mode under a BNLJ is an accidental cartesian
        "bnlj_cross": len(re.findall(r"BroadcastNestedLoopJoin [^,\n]*, Cross", plan)),
        "bnlj_bad": len(re.findall(r"BroadcastNestedLoopJoin [^,\n]*, (?!Cross)", plan)),
        # AQE's final-plan text marks whole-stage-codegen spans as *(n)
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": len(scans),
        "scans_with_pushdown": pushed,
        "arrow_stages": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "row_python_udf": len(re.findall(r"BatchEvalPython", plan)),
    }


def main() -> None:
    import bench
    from adampro_spark import oracle_suite
    from adampro_spark.session import get_spark

    spark = get_spark("plan-audit")
    registry = {**oracle_suite.QUERIES, **oracle_suite.BENCH_ONLY}
    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in registry]

    bad = 0
    for name in names:
        if name not in registry:
            print(f"?? {name}: not registered")
            continue
        df = registry[name](spark, SF_DIR)
        df.collect()  # AQE: audit the final plan
        a = audit(df._jdf.queryExecution().executedPlan().toString())
        flags = []
        if a["bnlj_bad"]:
            flags.append("CARTESIAN")
        if a["row_python_udf"]:
            flags.append("ROW-PYTHON-UDF")
        bad += bool(flags)
        print(
            f"{name:28s} shuffles={a['exchanges']:2d} bcast={a['broadcasts']} "
            f"codegen={a['codegen_spans']:2d} scans={a['scans']} "
            f"pushdown={a['scans_with_pushdown']} arrow={a['arrow_stages']} "
            f"lutx={a['bnlj_cross']}"
            + ("  !! " + ",".join(flags) if flags else "")
        )
        spark.catalog.clearCache()
    print(f"\n{len(names)} plans audited, {bad} flagged")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
