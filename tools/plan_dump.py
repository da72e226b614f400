"""Dump .explain("formatted") for bench/oracle queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  tag     — subdirectory under plans/ (e.g. r15)
  suffix  — 'before' or 'after' (file name: <query>_<suffix>.txt)
  query   — names from the merged QUERIES+BENCH_ONLY registry
            (default: every bench HEADLINE row)

Each file holds the FORMATTED plan of the query's final DataFrame at
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not perf).  For
composite rows whose callable runs eager internal stages (curate
pipelines), the dumped plan is the returned survivor lineage — the
per-stage shapes are audited separately via tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import bench
    from adampro_spark import oracle_suite
    from adampro_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    registry = {**oracle_suite.QUERIES, **oracle_suite.BENCH_ONLY}
    names = sys.argv[3:] or [n for n in bench.HEADLINE if n in registry]

    for name in names:
        if name not in registry:
            print(f"?? {name}: not registered")
            continue
        df = registry[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
