"""Watermarked streaming window aggregations.

Each function is the streaming twin of a batch query in
xngin_spark/queries/windows.py — SAME aggregate expressions, so the
batch result over the same files is the correctness oracle
(tests/test_streaming.py compares them row-for-row).

Watermark semantics: ``delay`` bounds how late an event may arrive and
still be aggregated; in append mode a window emits once the watermark
passes its end, and its state is dropped — state-store memory is
O(active windows × keys), independent of stream length. That bound is
what makes these run indefinitely at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xngin_spark.functions.aggregates import count_star, dsum
from xngin_spark.streaming.io import to_naive


def _windowed(sdf: DataFrame, window_col, delay: str) -> DataFrame:
    return (
        sdf.withWatermark("ts", delay)
        .groupBy(window_col.alias("w"), "event_type")
        .agg(count_star().alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            to_naive("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_tumbling(
    sdf: DataFrame, window: str = "1 hour", delay: str = "2 hours"
) -> DataFrame:
    """Tumbling count+sum per (window, event_type) — streaming twin of
    the ``events_tumbling`` batch query."""
    return _windowed(sdf, F.window("ts", window), delay)


def stream_sliding(
    sdf: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    delay: str = "2 hours",
) -> DataFrame:
    """Sliding-window twin of ``events_sliding`` (each event lands in
    window/slide overlapping windows)."""
    return _windowed(sdf, F.window("ts", window, slide), delay)


def stream_session(
    sdf: DataFrame, gap: str = "30 minutes", delay: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user — twin of ``events_session``.

    ``session_window`` is Spark's native stateful session operator:
    sessions merge as events arrive and close when the watermark passes
    last-event + gap.
    """
    return (
        sdf.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            count_star().alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            to_naive("session_start").alias("session_start"),
            to_naive("session_end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
