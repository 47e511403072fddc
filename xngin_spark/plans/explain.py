"""Plan introspection — the analog of the reference's EXPLAIN renderer
(doradb-plan/src/explain.rs:38-41) and the substrate for plan-shape
tests (the executable twin of doradb-tpch-tests/tests/build_lgc.rs /
rule_optimize.rs golden assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans (the Spark
    surface of the reference's ``TableScan.filt``, lgc/op.rs:543-553)."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            out.extend(s.strip() for s in inner.split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Every PartitionFilters entry across the plan's scans — the
    directory-pruning twin of ``pushed_filters`` (the reference's
    zone-map block skipping, at partition granularity). Entries
    containing ``dynamicpruning`` prove a runtime DPP subquery was
    planted by the optimizer."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            out.extend(s.strip() for s in inner.split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema line per scan — what column pruning actually reached
    the parquet reader (the reference's ``TableScan.cols``)."""
    return [
        ln.strip().split(":", 1)[1].strip()
        for ln in formatted_plan(df).splitlines()
        if ln.strip().startswith("ReadSchema:")
    ]


# Node kinds that determine scale behavior: every entry is either a
# shuffle, a join strategy, a Python-eval boundary, or a fused top-k.
# A plan-signature diff on these is a performance regression even when
# results stay correct (e.g. a dimension join silently flipping from
# broadcast to sort-merge).
PLAN_SIG_NODES = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "TakeOrderedAndProject",
)


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Counts of scale-relevant physical nodes — the snapshot unit for
    the plan-diff regression harness (tests/test_plan_snapshots.py)."""
    from collections import Counter

    c = Counter(node_names(df))
    return {k: c[k] for k in PLAN_SIG_NODES if c[k]}


def node_names(df: DataFrame) -> list[str]:
    """Physical operator names in plan order (from the formatted tree)."""
    import re

    names = []
    for ln in formatted_plan(df).splitlines():
        m = re.match(r"\s*[*+\-]*\s*\(?\d*\)?\s*([A-Za-z][A-Za-z0-9]+)", ln)
        if m and not ln.lstrip().startswith(("Output", "Input", "Arguments", "Functions",
                                            "Aggregate", "Keys", "Results", "Condition",
                                            "Location", "ReadSchema", "PushedFilters",
                                            "PartitionFilters", "DataFilters", "Batched",
                                            "Subquery:", "Format")):
            names.append(m.group(1))
    return names


def explain_analyze(df: DataFrame) -> str:
    """EXPLAIN ANALYZE: execute the plan, then render the simple plan
    text followed by per-node ACTUAL metrics (output rows, shuffle
    bytes) from the executed plan — what ran, not what was planned.
    The reference renders plans only (explain.rs); runtime metrics are
    the Spark upgrade. Execution drives df's OWN queryExecution (via its
    internal-row RDD), not a derived plan: ``df.count()`` would plan a
    separate ``groupBy().count()`` job and leave every metric on this
    plan's nodes at zero. Only a per-partition count ships to the
    driver regardless of result size."""
    from xngin_spark.plans.metrics import executed_node_metrics

    df._jdf.queryExecution().toRdd().count()
    lines = [
        df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "simple"
        ).rstrip(),
        "== Actual metrics ==",
    ]
    for name, mets in executed_node_metrics(df):
        interesting = {
            k: v
            for k, v in mets.items()
            if k in ("numOutputRows", "shuffleBytesWritten", "numFiles", "filesSize")
        }
        if interesting:
            lines.append(f"{name}: " + ", ".join(f"{k}={v}" for k, v in sorted(interesting.items())))
    return "\n".join(lines)
