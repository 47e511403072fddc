#!/usr/bin/env python
"""Measured scaling probe: run the full query suite at two SFs and
report per-query scaling exponents.

alpha = log(t_big / t_small) / log(scale_ratio); alpha ≈ 0 means
overhead-dominated, ≈ 1 linear, > 1 super-linear (flagged). Queries
that are input-bounded by design (doc_id < N predicates on the pairwise
verifiers) legitimately sit near 0 — their cost follows the candidate
set, not the corpus.

Usage:
  python tools/make_sf.py /root/testdata/sf0.1 /tmp/xngin_scale/sf1 10
  python tools/scaling_probe.py /root/testdata/sf0.1 /tmp/xngin_scale/sf1 10

Writes BENCH_SCALING.json {query: {t_small, t_big, alpha}} and prints a
sorted table.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
        check=True,
    )
    with open("BENCH_FULL.json") as f:
        return json.load(f)


def main(small_dir: str, big_dir: str, ratio: float) -> None:
    small = run_bench(small_dir)
    print(f"# small done: {small['value']}s total", flush=True)
    big = run_bench(big_dir)
    print(f"# big done: {big['value']}s total", flush=True)

    c_small = small.get("canary_mean_sec") or 1.0
    c_big = big.get("canary_mean_sec") or 1.0
    rows = {}
    for q, ts in small["queries"].items():
        tb = big["queries"].get(q)
        if tb is None or ts <= 0 or tb <= 0:
            continue
        # normalize by each run's canary so a host-speed shift between
        # the two runs doesn't masquerade as a scaling term
        alpha = math.log((tb / c_big) / (ts / c_small)) / math.log(ratio)
        rows[q] = {
            "t_small": ts,
            "t_big": tb,
            "alpha": round(alpha, 2),
        }
    doc = {
        "ratio": ratio,
        "small_dir": small_dir,
        "big_dir": big_dir,
        "canary_small": c_small,
        "canary_big": c_big,
        "queries": rows,
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    for q, r in sorted(rows.items(), key=lambda kv: -kv[1]["alpha"]):
        flag = "  <-- SUPER-LINEAR" if r["alpha"] > 1.05 and r["t_big"] > 1 else ""
        print(f"{q:36s} {r['t_small']:8.2f}s {r['t_big']:8.2f}s  a={r['alpha']:5.2f}{flag}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
