#!/usr/bin/env python
"""Per-query profile: split CONSTRUCT time (driver work + any eager jobs
the query function runs — localCheckpoints, streams, maintenance epochs)
from MATERIALIZE time (noop write of the returned frame), plus the job
count each phase submits. The bench charges both to one number; this
split says which side to optimize (guide §1: measure first).

Usage: python tools/profile_queries.py name [name ...]   # sf from env
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from xngin_spark import queries as Q
    from xngin_spark.session import get_spark

    Q.load_all()
    spark = get_spark("xngin_profile")
    sc = spark.sparkContext

    def jobs_so_far() -> int:
        # dagScheduler.nextJobId is the monotone job counter — counts
        # every submitted job regardless of group (statusTracker only
        # sees per-group ids)
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    # warm: tables + python workers, same as bench.py
    from xngin_spark.catalog import ALL_TABLES

    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name in names:
        fn = Q.QUERIES[name]
        j0 = jobs_so_far()
        sc.setJobDescription(f"{name}: construct")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = jobs_so_far()
        sc.setJobDescription(f"{name}: materialize")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = jobs_so_far()
        sc.setJobDescription(None)
        rec = {
            "construct_s": round(t1 - t0, 3),
            "materialize_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "construct_jobs": j1 - j0,
            "materialize_jobs": j2 - j1,
        }
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
