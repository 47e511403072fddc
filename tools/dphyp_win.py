#!/usr/bin/env python
"""Measure the DPhyp SQL-route win on the adversarial mis-ordered q5
text (queries/micro.DPHYP_WIN_SQL): plain ``spark.sql`` executes the
syntactic join order (CBO reorder off — Spark's default), which builds
the lineitem ⋈ supplier fact-fact join first; ``dphyp_rewrite``
restores the selective order. Both legs run interleaved in ONE session
(median of N passes each) so host-speed windows cancel out of the
ratio — the scaling_probe discipline.

Usage:
  python tools/dphyp_win.py [sf_dir ...]     # default /root/testdata/sf0.1

Merge-writes DPHYP_WIN.json keyed by sf dir and prints the ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "DPHYP_WIN.json")


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    from xngin_spark.plans.sqlreorder import dphyp_rewrite
    from xngin_spark.queries.micro import DPHYP_WIN_SQL
    from xngin_spark.queries.tpch import T
    from xngin_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    passes = int(os.environ.get("DPHYP_WIN_PASSES", "3"))
    spark = get_spark("dphyp_win", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)

    for sf_dir in sf_dirs:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
            T(spark, sf_dir, t).createOrReplaceTempView(t)
        text, traces = dphyp_rewrite(spark, DPHYP_WIN_SQL)
        if not traces:
            raise SystemExit("dphyp_rewrite fell back — nothing to measure")
        plain_rows = sorted(map(tuple, spark.sql(DPHYP_WIN_SQL).collect()))
        reord_rows = sorted(map(tuple, spark.sql(text).collect()))
        if plain_rows != reord_rows:
            raise SystemExit("rewrite changed results — DO NOT record a win")
        plain_ts, reord_ts = [], []
        for _ in range(passes):  # interleaved: each pair shares a window
            t0 = time.time()
            spark.sql(DPHYP_WIN_SQL).collect()
            plain_ts.append(time.time() - t0)
            t0 = time.time()
            spark.sql(text).collect()
            reord_ts.append(time.time() - t0)
        p, r = _median(plain_ts), _median(reord_ts)
        doc[sf_dir] = {
            "plain_sec": round(p, 3),
            "reordered_sec": round(r, 3),
            "ratio": round(p / r, 2),
            "passes": passes,
            "merge_trace": [
                [sorted(left), sorted(right)] for left, right in traces[0]
            ],
        }
        print(f"{sf_dir}: plain {p:.2f}s reordered {r:.2f}s "
              f"ratio {p / r:.2f}x")

    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
