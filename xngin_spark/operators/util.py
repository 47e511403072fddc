"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure at least cluster-parallelism partitions before an
    expression-heavy map stage.

    Parquet can't split below one row group, so a small file (or a
    coalesced upstream stage) serializes everything after it onto one
    core. When the input already has enough partitions — the normal case
    on a real cluster reading many files — this is a no-op costing one
    ``getNumPartitions`` call, so the full-data shuffle only ever happens
    on inputs small enough for it to be cheap.
    """
    if df.isStreaming:
        # micro-batch parallelism is governed by the source (file
        # splits / Kafka partitions) and shuffle conf; .rdd is illegal
        # on a streaming frame, so the guard no-ops — letting the
        # map-side operators (signatures, features) run unchanged in
        # streaming twins
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def release_checkpoint(df: DataFrame) -> None:
    """Release the storage held by a ``localCheckpoint(eager=True)``
    DataFrame once it is no longer needed.

    ``df.rdd.unpersist()`` is a no-op here: ``.rdd`` deserializes a NEW
    RDD over the checkpointed plan, and unpersisting that fresh wrapper
    leaves the actually-persisted internal RDD in the block manager
    (verified via ``sc.getPersistentRDDs``). The persisted RDD is the
    one the checkpointed Dataset's ``LogicalRDD`` leaf carries — grab
    that handle and unpersist it. Iterative operators (connected
    components, k-means) call this per superseded iteration so storage
    stays O(1) in iteration count instead of accumulating one
    checkpoint per round.

    Only call on a DataFrame whose data is truly dead: a locally
    checkpointed RDD has no lineage and cannot be recomputed after
    unpersisting.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.nodeName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # release is best-effort; never fail the query over cleanup
