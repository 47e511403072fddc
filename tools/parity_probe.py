#!/usr/bin/env python
"""Cross-engine value parity at an arbitrary scale — the sweep that
extends the bit-exact claim beyond the pytest scales (sf0.001-sf1 are
covered by tests/test_tpch_parity.py; this script exists to push the
span to sf10+, where DuckDB twins take minutes each and belong in a
background artifact, not the suite).

Every 10x step so far exposed a distinct latent determinism or scale
bug (decimal midpoint ties at sf1, the winnow cap collapse at sf10 —
SCALE.md), which is why the span keeps getting pushed: parity at one
scale does NOT imply parity at the next.

Runs compare() (the driver gate's exact semantics: row count + columns
+ order-insensitive value hash) for a curated subset covering every
value-determinism family — decimal-sum aggregation, floor-grid int64
screens, rounded-then-decimal retrieval scoring, md5-keyed hashing,
window/sequence logic, CDC maintenance — and merge-writes
PARITY_SF10.json keyed by query.

Usage:
  python tools/parity_probe.py [sf_dir] [name ...]   # default sf10 subset
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.environ.get("XNGIN_PARITY_OUT", os.path.join(REPO, "PARITY_SF10.json"))

#: one row per value-determinism family; heavy tails deliberately in
#: (the point is the scales where they hurt)
DEFAULT_NAMES = [
    # decimal-sum TPC-H (big joins, revenue-scale sums)
    "q1", "q5", "q9", "q18", "q21",
    # dedup family: md5 minhash/simhash, span logic, window counting.
    # dedup_winnow is deliberately NOT here: at the self-union sf10 the
    # boilerplate cap drops every fingerprint (the round-9 warn guard),
    # so both engines produce the empty set — a ~30 min DuckDB grind to
    # compare empty with empty; the winnow grid's cross-engine
    # determinism is pinned at sf1 by the pytest sweep instead.
    "dedup_exact", "dedup_minhash_checked", "dedup_simhash_checked",
    "dedup_span_extract", "passage_dedup",
    # ANN / embedding: floor-grid int64 cosine + PQ, JL projection
    "knn_cosine", "knn_l2_pq_checked", "embedding_jl_project",
    "ann_recall_eval", "retrieval_ranking_eval",
    # retrieval: rounded-then-decimal scoring, positional postings
    "bm25_topk", "bm25_index_probe", "hybrid_rrf", "phrase_search",
    "tfidf_topk",
    # text quality: regex/stat scans
    "text_stats", "gopher_quality", "quality_classifier",
    "contamination_ngram", "lang_id",
    # CDC maintenance == recompute, decimal-exact
    "incremental_agg_maintain", "incremental_distinct_maintain",
    "incremental_agg_multi",
    # events: windows, temporal joins, sequence patterns, centrality
    "events_tumbling", "events_asof_join", "events_pattern_match",
    "pagerank_event_chain", "pagerank_dedup_graph",
    # attribution: the standard four-model set (last-touch is implied
    # by events_stream_attribution; micro-unit truncated ratio credits)
    "events_attribution_ushaped", "events_attribution_linear",
    "events_attribution_timedecay",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/xngin_scale/sf10"
    names = args[1:] or DEFAULT_NAMES

    from xngin_spark import queries as Q
    from xngin_spark.oracle import compare, duckdb_connect
    from xngin_spark.session import get_spark

    Q.load_all()
    spark = get_spark(
        "parity_probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    con = duckdb_connect(sf_dir)

    doc: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc.setdefault("sf_dir", sf_dir)
    results = doc.setdefault("queries", {})

    failed = []
    for name in names:
        if name not in Q.ORACLE:
            print(f"# {name}: no oracle, skipped", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            res = compare(name, Q.QUERIES[name](spark, sf_dir), con, Q.ORACLE[name])
            ok = bool(res.ok)
            results[name] = {
                "ok": ok,
                "rows": res.spark_rows,
                "sec": round(time.time() - t0, 2),
            }
            if not ok:
                results[name]["detail"] = (
                    f"spark {res.spark_rows}/{res.spark_hash} vs "
                    f"oracle {res.oracle_rows}/{res.oracle_hash}"
                )
        except Exception as e:  # record, keep sweeping
            ok = False
            results[name] = {
                "ok": False,
                "error": f"{type(e).__name__}: {e}"[:200],
                "sec": round(time.time() - t0, 2),
            }
            # a fatal DuckDB error (e.g. an OOM inside one oracle)
            # INVALIDATES the connection — without a reconnect every
            # later query cascade-fails in seconds (observed at sf100)
            try:
                con.close()
            except Exception:
                pass
            con = duckdb_connect(sf_dir)
        if not ok:
            failed.append(name)
        print(f"{name}: {'OK' if ok else 'FAIL'} "
              f"({results[name]['sec']}s)", flush=True)
        # merge-write per query: a killed multi-hour probe keeps its
        # completed rows (same discipline as scaling_probe)
        doc["n_ok"] = sum(1 for r in results.values() if r.get("ok"))
        doc["n_total"] = len(results)
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")

    doc["n_ok"] = sum(1 for r in results.values() if r.get("ok"))
    doc["n_total"] = len(results)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {doc['n_ok']}/{doc['n_total']} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
