"""Capture .explain("formatted") for every declared query into
plans/r06/<query>_<tag>.txt (guide §1: plan-shape evidence before/after).

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag        "before" or "after" (file suffix)
  query ...  optional subset of query names; default = all QUERIES

Runs on sf0.001 (plan shape, not timing).  Queries whose builder runs
driver-side control-flow loops (kNN) still produce their final plan.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r06")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from vector2dggs_spark.entrypoints import QUERIES
    from vector2dggs_spark.session import get_spark

    spark = get_spark(app="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name, (fn, _) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record and continue
            failures.append((name, repr(e)))
            continue
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")
    if failures:
        for name, err in failures:
            print(f"FAILED {name}: {err}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
