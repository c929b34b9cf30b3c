"""Click→purchase attribution as a stream-stream interval join.

The §2.10 surface the other streaming modules don't cover: joining TWO
live streams on a key plus an event-time range. The reference's webhook
path joins a stream against a static base (streaming/incremental.py);
here both sides are unbounded — Spark buffers each side in state, the
watermarks bound how long, and the time-range condition between the two
event-time columns is what lets the state store evict (Spark derives the
state watermark from it; without the range predicate the join would
buffer forever).

ONE function serves batch and streaming (the twin contract the windowed
HLL/CMS modules use): ``attribution_pairs`` takes either two batch frames
or two ``readStream`` frames — watermarks are applied only when the
inputs are streaming, and in batch mode the same plan compiles to an
equi-join on user with the range predicate as a post-filter (no
BroadcastNestedLoopJoin: the equality conjunct keys the shuffle). The
DuckDB oracle for the batch twin lives with ``events_attribution_pairs``
(operators/relational.py); the streaming parity test feeds the same
events through parquet chunks (JSON would truncate microsecond
timestamps) and asserts set-identical pairs.

This is MULTI-touch attribution (every qualifying click pairs with the
purchase); the LAST-touch reduction is the separate union-window operator
``events_attribution`` — last-touch needs a max-per-purchase after the
join, which would be a second stateful operator in the stream, and the
batch union-window plan does it with zero joins instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ATTR_WINDOW_S = 3600
# Streaming state bounds: clicks must outlive the attribution window
# (state for a click can match purchases up to window_s later); purchases
# only need the reorder slack of the source.
CLICK_WATERMARK = "2 hours"
PURCHASE_WATERMARK = "30 minutes"


def attribution_pairs(
    clicks: DataFrame, purchases: DataFrame, window_s: int = ATTR_WINDOW_S
) -> DataFrame:
    """(user_id, purchase_id, click_id, lag_us): every (click, purchase)
    pair of the same user with the purchase inside [click, click+window_s].

    Works on batch or streaming inputs; both inputs need columns
    (event_id, user_id, ts)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", CLICK_WATERMARK)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", PURCHASE_WATERMARK)
    joined = c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts"
            f" AND purchase_ts <= click_ts + interval {window_s} seconds"
        ),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .cast("long")
        .alias("lag_us"),
    )
