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
    subset = bool(names or extra)
    out = os.environ.get("SPARK_GRAFT_OUT", "BENCH_SF1.json")
    # a SUBSET run (e.g. benching newly registered queries) must MERGE
    # into the standing full-corpus artifact, never clobber it — the
    # scaling_probe.write_results lesson applied to the sf1 point.
    # bench.py writes whole payloads, so route subsets via a temp file.
    run_out = "BENCH_SF1_SUBSET.json" if subset and out == "BENCH_SF1.json" else out
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF1_DIR,
        SPARK_GRAFT_REPEATS=os.environ.get("SPARK_GRAFT_REPEATS", "3"),
        SPARK_GRAFT_OUT=run_out,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *names, *extra],
        env=env, cwd=REPO,
    )
    if proc.returncode == 0 and run_out != out:
        import json

        with open(os.path.join(REPO, run_out)) as f:
            part = json.load(f)
        full_path = os.path.join(REPO, out)
        doc = {}
        if os.path.exists(full_path):
            with open(full_path) as f:
                doc = json.load(f)
        for key in ("queries", "queries_norm", "queries_spread"):
            doc.setdefault(key, {}).update(part.get(key) or {})
        doc["value"] = round(
            sum(v for v in doc["queries"].values() if v >= 0), 3
        )
        doc["n_queries"] = len(doc["queries"])
        with open(full_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        os.remove(os.path.join(REPO, run_out))
        print(f"# merged {len(part.get('queries') or {})} subset rows "
              f"into {out}", file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
