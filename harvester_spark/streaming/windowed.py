"""Watermarked tumbling-window aggregation over the event stream.

The Structured Streaming shape for late data (driver brief: "watermarks +
windowed aggs"): events are aggregated into tumbling windows keyed
(window, event_type); the watermark bounds state and drops events arriving
later than ``late_threshold`` behind the max seen event time. Append mode
emits a window only once it can no longer change — the exactly-once batch
equivalent is :func:`harvester_spark.operators.relational.events_hourly_rollup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WINDOW = "1 hour"
LATE_THRESHOLD = "30 minutes"


def windowed_counts(
    events: DataFrame, window: str = WINDOW, late_threshold: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming events(ts, event_type, value) → watermarked window counts."""
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_c"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_c",
        )
    )
