"""Streaming dedup and stream-stream joins.

Two more stateful-operator shapes on top of streaming/windows.py and
stateful.py:

- ``stream_dedup``: at-least-once sources (Kafka replays, file
  re-lists, upstream retries) need exactly-once semantics downstream;
  ``dropDuplicatesWithinWatermark`` keeps the seen-key set only inside
  the watermark horizon, so state is bounded by (arrival rate ×
  delay), not by stream lifetime — the only dedup that survives an
  unbounded stream.
- ``stream_stream_join``: watermarked interval join; the time-range
  predicate lets Spark expire buffered rows once the watermark passes
  the join horizon, again bounding state. Without the range condition a
  stream-stream inner join would buffer both streams forever.

Batch twins of both are exact (union+distinct / range join), so the
registered queries carry full DuckDB oracles — incremental execution
must reproduce the batch answer bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    sdf: DataFrame, keys: tuple[str, ...] = ("event_id",), delay: str = "2 hours"
) -> DataFrame:
    """Exactly-once projection of an at-least-once event stream: drop
    re-deliveries of the same key arriving within the watermark delay.
    State per key is one entry, expired when the watermark passes its
    event time."""
    return sdf.withWatermark("ts", delay).dropDuplicatesWithinWatermark(list(keys))


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    delay: str = "2 hours",
    horizon_s: int = 300,
) -> DataFrame:
    """Interval join of two live streams: click → purchases by the same
    user within ``horizon_s`` seconds after it. Both sides watermarked;
    the two-sided time bound lets the state store evict a buffered row
    as soon as the other stream's watermark clears its join window."""
    c = clicks.withWatermark("ts", delay).alias("l")
    p = purchases.withWatermark("ts", delay).alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon_s} SECOND"))
    )
    return c.join(p, cond, "inner").select(
        F.col("l.event_id").alias("event_id"),
        F.col("r.event_id").alias("event_id_r"),
    )
