"""Exactly-once ingest dedup: ``dropDuplicatesWithinWatermark``.

Webhook-class sources redeliver (at-least-once delivery — the reference's
webhook ingest tolerates replays by upserting on the primary key at the
database layer; streaming/webhook.py's foreachBatch MERGE does the same
per batch). The Spark-native guard for duplicates that arrive in
DIFFERENT micro-batches is ``dropDuplicatesWithinWatermark``: the state
store holds each key only until the watermark passes its event time plus
the delay, so state stays bounded by the redelivery horizon instead of
growing with the full key history (plain streaming ``dropDuplicates``
would keep every key forever).

One function serves batch and streaming (the attribution.py twin
contract): in batch mode the same call is a plain ``dropDuplicates`` on
the key — the parity test replays OVERLAPPING parquet chunks (real
duplicate rows spanning micro-batches) and asserts the stream emits
exactly the batch-distinct set. The choice of delay is the operator's
contract: duplicates separated by more than the delay in EVENT time may
be re-emitted; callers size it to their source's redelivery horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

INGEST_DEDUP_DELAY = "10 days"


def dedup_events(
    events: DataFrame, delay: str = INGEST_DEDUP_DELAY
) -> DataFrame:
    """(event_id, user_id, event_type, ts) with redelivered rows dropped —
    exactly-once per event_id within the event-time delay horizon."""
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    if ev.isStreaming:
        return ev.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return ev.dropDuplicates(["event_id"])
