#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/$XNGIN_PLANS_ROUND/.

Usage:
  python tools/dump_plans.py before q1 dedup_pipeline ...
  python tools/dump_plans.py after q1 ...

Writes plans/<round>/<name>_<tag>.txt (round = XNGIN_PLANS_ROUND, default
r12) — the optimization round's plan
evidence (Exchange count, join strategy, PushedFilters/ReadSchema,
WholeStageCodegen spans, Python-eval nodes).

Queries whose function EXECUTES work during construction (streaming
twins, maintenance epochs) still produce a plan for the RETURNED frame;
that is the contract's observable output.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("XNGIN_PLANS_ROUND", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)

    from xngin_spark import queries as Q
    from xngin_spark.session import get_spark

    Q.load_all()
    spark = get_spark("xngin_plan_dump")
    for name in names:
        fn = Q.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            txt = f"ERROR building plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt if txt.endswith("\n") else txt + "\n")
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
