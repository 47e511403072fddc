#!/usr/bin/env python
"""Per-round sf1 bench point: run the FULL query corpus against the
synthesized 10x dataset and record BENCH_SF1.json, so scale
regressions show up as committed numbers round-over-round, not as
alpha extrapolations.

Round 8 (VERDICT r07 task 1): the default grew from the 50-query gate
window to the WHOLE corpus — the gate queries are exactly the cheap
ones, while the scale risks live in the tail (streaming maintenance,
dedup_*, bpe_*, hybrid_rrf). Pass --gate for the old gate-only
subset.

- Synthesizes /tmp/xngin_scale/sf1 via tools/make_sf.py if absent
  (10x self-union of $SPARK_GRAFT_SF_DIR, see make_sf.py's contract).
- Reuses bench.py verbatim (SPARK_GRAFT_OUT redirects the full-payload
  artifact away from BENCH_FULL.json); 3 passes so the sf1 point
  carries per-query medians and a spread band — single-pass runs were
  measured flagging disjoint noise sets round-over-round.
- Compare rounds with: python bench_compare.py BENCH_SF1_prev.json
  BENCH_SF1.json (same canary normalization applies).

Usage: python tools/bench_sf1.py [extra query names...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.environ.get("XNGIN_SF1_DIR", "/tmp/xngin_scale/sf1")
SRC_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(extra: list[str]) -> int:
    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        print(f"# synthesizing {SF1_DIR} from {SRC_DIR} (10x)", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf.py"),
             SRC_DIR, SF1_DIR, "10"],
            check=True,
        )
    sys.path.insert(0, REPO)
    names: list[str] = []
    if "--gate" in extra:
        extra = [a for a in extra if a != "--gate"]
        from __spark_entry__ import GATE_PRIORITY

        names = list(GATE_PRIORITY)
    # no names → bench.py runs the full registered corpus
    # 3 passes, not 1: back-to-back single-pass sf1 runs were measured
    # flagging DISJOINT 1.5-3x "regression" sets (events_session
    # 4.4s->1.3s, knn_cosine 3.5s->9.3s between two round-7 runs) —
    # per-query medians + the recorded spread band are what let
    # bench_compare separate a real sf1 regression from one noisy pass
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF1_DIR,
        SPARK_GRAFT_REPEATS=os.environ.get("SPARK_GRAFT_REPEATS", "3"),
        SPARK_GRAFT_OUT=os.environ.get("SPARK_GRAFT_OUT", "BENCH_SF1.json"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *names, *extra],
        env=env, cwd=REPO,
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
