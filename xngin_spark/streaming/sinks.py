"""Incremental materialized view: streaming window aggregates upserted
into partitioned parquet via ``foreachBatch`` + dynamic partition
overwrite.

Update-mode emits only the (window, key) rows whose aggregate changed in
a micro-batch; overwriting exactly those rows' partitions converges the
parquet table to the batch answer and is idempotent under replays (a
re-delivered batch rewrites the same partitions with the same state).
This is the standard lambda-architecture collapse: one streaming job
maintains the serving table instead of nightly batch rebuilds.

Partition granularity IS the correctness unit: dynamic overwrite
replaces whole partitions, so the partition key must include every
grouping column that update-mode can emit independently (here
(window, event_type)). Partitioning by window alone would drop the
other event types of a half-updated window. At 100 TB the same layout
holds — partitions stay small because they're per-(hour, type), and
the writer touches only partitions the watermark is still moving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_window_counts(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    delay: str = "2 hours",
    timeout_s: int = 120,
) -> None:
    """Maintain a parquet table of hourly per-type event counts from a
    stream, exactly-once per partition. Runs availableNow to exhaustion
    (raises on timeout like streaming/io.run_available_now)."""
    agg = (
        sdf.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    # zoneless bounds out (see streaming/io.to_naive) so the parquet MV
    # carries the same naive values as the batch twin in any session tz
    from xngin_spark.streaming.io import to_naive

    agg = agg.withColumn("window_start", to_naive("window_start"))

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(
                "w_part", F.date_format("window_start", "yyyy-MM-dd-HH")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("w_part", "event_type")
            .parquet(path)
        )

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"incremental sink did not finish in {timeout_s}s")


def incremental_ivf_index(
    sdf: DataFrame,
    centroids: list[list[float]],
    path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    timeout_s: int = 120,
) -> None:
    """Maintain a partition-pruned IVF ANN index from a STREAM of
    embeddings: each micro-batch assigns its vectors to their nearest
    (frozen) centroid map-side — no shuffle, centroids are plan
    literals — and lands under ``path/batch=<id>/ivf_list=<l>/``.

    Exactly-once: a batch overwrites ITS OWN batch directory, so a
    replayed micro-batch rewrites identical files instead of appending
    duplicates. Readers discover (batch, ivf_list) as partition columns;
    probes filter on ivf_list, so directory pruning skips un-probed
    lists across every batch — the streaming twin of
    operators/clustering.ivf_persist, and the shape that keeps a
    continuously-ingesting 100 TB corpus searchable without rebuilds.
    Compact old batch dirs offline when small files accumulate (same
    discipline as any streaming parquet sink).
    """
    from xngin_spark.operators.clustering import _nearest

    assigned = sdf.withColumn("ivf_list", _nearest(F.col(vec_col), centroids)["c"])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy("ivf_list")
            .parquet(f"{path}/batch={batch_id}")
        )

    q = (
        assigned.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"ivf index sink did not finish in {timeout_s}s")
