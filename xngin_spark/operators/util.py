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
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
