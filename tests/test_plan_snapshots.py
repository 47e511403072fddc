"""Per-query plan-diff regression harness.

``plan_snapshots.json`` pins the scale-relevant physical-node counts
(shuffles, join strategies, Python-eval boundaries, fused top-k — see
``PLAN_SIG_NODES``) for every registered batch query at sf0.001. A diff
means the physical strategy changed: a new Exchange, a broadcast join
degrading to sort-merge, a Python boundary appearing. Results can stay
bit-correct through all of those — only this harness catches them.

Regenerate intentionally after a deliberate plan change:

    XNGIN_REGEN_PLAN_SNAPSHOTS=1 python -m pytest \
        tests/test_plan_snapshots.py -q -k regen

The harness's own sensitivity is proven by
``test_harness_catches_broadcast_regression``, which injects a
broadcast->shuffle flip (autoBroadcastJoinThreshold=-1) and asserts the
signature comparison fails.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from xngin_spark import queries as Q
from xngin_spark.plans.explain import plan_signature

Q.load_all()

SNAP_PATH = Path(__file__).parent / "plan_snapshots.json"
# the events_stream_* queries run a Structured Streaming query during
# plan construction; their incremental plans aren't comparable here
# (covered by tests/test_streaming.py batch-as-oracle instead).
SKIP = {
    "events_stream_tumbling",
    "events_stream_dedup",
    "events_stream_join",
    "events_stream_transitions",
    "docs_stream_dedup",
}
NAMES = sorted(n for n in Q.QUERIES if n not in SKIP)


def _load() -> dict[str, dict[str, int]]:
    if not SNAP_PATH.exists():
        return {}
    return json.loads(SNAP_PATH.read_text())


@pytest.mark.skipif(
    not os.environ.get("XNGIN_REGEN_PLAN_SNAPSHOTS"), reason="regen is opt-in"
)
def test_regen_snapshots(spark, sf_dir):
    snaps = {n: plan_signature(Q.QUERIES[n](spark, sf_dir)) for n in NAMES}
    SNAP_PATH.write_text(json.dumps(snaps, indent=1, sort_keys=True) + "\n")


@pytest.mark.parametrize("name", NAMES)
def test_plan_signature_unchanged(name, spark, sf_dir):
    snaps = _load()
    assert name in snaps, (
        f"{name} has no plan snapshot — regenerate with "
        "XNGIN_REGEN_PLAN_SNAPSHOTS=1 pytest tests/test_plan_snapshots.py -k regen"
    )
    sig = plan_signature(Q.QUERIES[name](spark, sf_dir))
    assert sig == snaps[name], (
        f"{name}: physical plan shape changed.\n  snapshot: {snaps[name]}\n"
        f"  current:  {sig}\nIf intentional, regenerate the snapshot."
    )


def test_harness_catches_broadcast_regression(spark, sf_dir):
    snaps = _load()
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        sig = plan_signature(Q.QUERIES["q3"](spark, sf_dir))
    finally:
        spark.conf.set(key, old)
    assert sig != snaps["q3"], "harness failed to detect an injected regression"
    assert sig.get("BroadcastHashJoin", 0) < snaps["q3"].get("BroadcastHashJoin", 0)


def test_explain_analyze_reports_actual_metrics(spark, sf_dir):
    from xngin_spark.plans.explain import explain_analyze

    from xngin_spark import queries as Q2

    import re

    def metric_values(text: str, metric: str) -> list[int]:
        return [int(v) for v in re.findall(rf"{metric}=(\d+)", text)]

    out = explain_analyze(Q2.QUERIES["q6"](spark, sf_dir))
    assert "== Actual metrics ==" in out
    # the metrics must come from THIS plan's execution, not a derived
    # count() job — the scan really read rows, so some node reports > 0
    assert any(v > 0 for v in metric_values(out, "numOutputRows"))
    # q1 aggregates through an exchange — real bytes must have moved
    out1 = explain_analyze(Q2.QUERIES["q1"](spark, sf_dir))
    assert any(v > 0 for v in metric_values(out1, "shuffleBytesWritten"))
