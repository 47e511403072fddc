#!/usr/bin/env python
"""Pin the QUALITY metrics at sf1 (round-8 verdict #9): the recall /
ranking-quality evaluation rows are value-checked at oracle scale every
round, but their MEASURED values were only recorded at sf0.1 — so the
"recall holds at scale" claim rode on the perf artifacts alone. This
runs the evaluation family at an arbitrary sf dir and records the full
row sets, so approximation-quality claims scale with the perf claims.

Rows pinned: dedup_recall_eval (MinHash S-curve: per-band recall vs
exact Jaccard), ann_recall_eval (IVF/LSH recall@10), ivf_nprobe_tuned
(recall-vs-nprobe curve + tuned pick), retrieval_ranking_eval
(nDCG@10/MRR vs exact cosine).

Usage: python tools/quality_sf1.py [sf_dir ...]   # default /tmp/xngin_scale/sf1
Merge-writes QUALITY_SF1.json keyed by sf dir.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "QUALITY_SF1.json",
)

ROWS = [
    "dedup_recall_eval",
    "ann_recall_eval",
    "ivf_nprobe_tuned",
    "retrieval_ranking_eval",
]


def main() -> None:
    from xngin_spark.queries import QUERIES, load_all
    from xngin_spark.session import get_spark

    load_all()
    sf_dirs = sys.argv[1:] or ["/tmp/xngin_scale/sf1"]
    spark = get_spark(
        "quality_sf1", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    for sf_dir in sf_dirs:
        entry = {}
        for name in ROWS:
            df = QUERIES[name](spark, sf_dir)
            cols = df.columns
            rows = sorted(map(list, map(tuple, df.collect())))
            entry[name] = {"columns": cols, "rows": rows}
            print(f"{sf_dir} {name}: {len(rows)} rows")
        doc[sf_dir] = entry
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
