#!/usr/bin/env python
"""sf1 leg of the DPhyp win with a watchdog on the plain side: the
mis-ordered plan at sf1 spills so badly that a full pass exceeds any
reasonable bench budget (two separate 58-minute wall-clock windows were
killed without completing one plain pass). This records the reordered
side properly (3-pass median) and the plain side as a MEASURED LOWER
BOUND: run until the watchdog fires, cancel the Spark jobs, record the
elapsed floor. The artifact then carries ratio as a lower bound — an
honest ">=", not a fabricated point.

Usage: python tools/dphyp_win_sf1_bound.py [sf_dir] [plain_budget_sec]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "DPHYP_WIN.json")


def main() -> None:
    from xngin_spark.plans.sqlreorder import dphyp_rewrite
    from xngin_spark.queries.micro import DPHYP_WIN_SQL
    from xngin_spark.queries.tpch import T
    from xngin_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xngin_scale/sf1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
    spark = get_spark("dphyp_win_sf1",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        T(spark, sf_dir, t).createOrReplaceTempView(t)
    text, traces = dphyp_rewrite(spark, DPHYP_WIN_SQL)
    if not traces:
        raise SystemExit("dphyp_rewrite fell back — nothing to measure")

    reord_ts = []
    for _ in range(3):
        t0 = time.time()
        spark.sql(text).collect()
        reord_ts.append(time.time() - t0)
    reord = sorted(reord_ts)[1]
    print(f"reordered median {reord:.2f}s over {reord_ts}")

    done = threading.Event()
    elapsed = [0.0]

    def plain_leg():
        t0 = time.time()
        try:
            spark.sql(DPHYP_WIN_SQL).collect()
            elapsed[0] = time.time() - t0
        except Exception:
            elapsed[0] = -(time.time() - t0)  # cancelled mid-run
        done.set()

    th = threading.Thread(target=plain_leg, daemon=True)
    t0 = time.time()
    th.start()
    finished = done.wait(budget)
    if not finished:
        spark.sparkContext.cancelAllJobs()
        done.wait(60)
    plain = elapsed[0] if elapsed[0] > 0 else time.time() - t0

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    entry = {
        "reordered_sec": round(reord, 3),
        "passes": 3,
        "merge_trace": [[sorted(a), sorted(b)] for a, b in traces[0]],
    }
    if finished and elapsed[0] > 0:
        entry["plain_sec"] = round(plain, 3)
        entry["ratio"] = round(plain / reord, 2)
    else:
        entry["plain_sec_lower_bound"] = round(plain, 3)
        entry["ratio_lower_bound"] = round(plain / reord, 2)
        entry["note"] = (
            "plain leg cancelled at the watchdog budget without completing "
            "one pass (two prior uncapped attempts were also killed at "
            ">=58 min wall-clock); the recorded ratio is a measured floor"
        )
    doc[sf_dir] = entry
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({sf_dir: entry}, indent=1))


if __name__ == "__main__":
    main()
