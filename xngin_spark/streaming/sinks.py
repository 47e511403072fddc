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
