"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
the bench HEADLINE + PIPELINES sets). Queries whose construction runs
eager work (iterative CC, table writes) still produce a plan for the
RETURNED frame — that is the honest artifact for them, and the file
notes it. $SPARK_GRAFT_SF_DIR picks the data (default sf0.1, matching
the bench).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    import __spark_entry__ as entry_mod
    from bench import HEADLINE, PIPELINES
    from flink_project_userbehavioranalysis_spark import get_spark

    names = sys.argv[3:] or (HEADLINE + PIPELINES)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
    os.makedirs(here, exist_ok=True)
    spark = get_spark(app_name="dump-plans", streaming=True)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN UNAVAILABLE: {type(e).__name__}: {e}"
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
