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


def windowed_user_hll(
    events: DataFrame,
    window: str = WINDOW,
    late_threshold: str = LATE_THRESHOLD,
    slide: str | None = None,
) -> DataFrame:
    """Streaming events(ts, user_id) → watermarked per-window HLL register
    rows (window_start, bucket, r).

    Distinct-count-per-window is exactly what a watermarked stream cannot
    answer with bounded state naively (the per-user set grows without
    bound); the HLL register file IS the bounded state: 256 rows per open
    window, merged by max — an algebraic aggregate Spark can partial-merge,
    so this is one streaming-legal groupBy((window, bucket)).max(rho).
    The register rows are byte-identical to the batch twin's
    (operators/sketches.events_hll_hourly — parity-tested); fold them with
    sketches.hll_fold_registers to read estimates.
    """
    from harvester_spark.operators.sketches import HLL_M, _hash56, _rho_case

    keyed = events.select("ts", _hash56(F.col("user_id").cast("string")).alias("hv")).select(
        "ts",
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(f"hv DIV {HLL_M}").alias("w"),
    )
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    ).alias("win")
    return (
        keyed.withWatermark("ts", late_threshold)
        .groupBy(win, F.col("bucket"))
        .agg(F.max(F.expr(_rho_case("w"))).alias("r"))
        .select(F.col("win.start").alias("window_start"), "bucket", "r")
    )


def windowed_key_cms(
    events: DataFrame, window: str = "1 day", late_threshold: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming events(ts, key) → watermarked per-window count-min cells
    (window_start, row, bucket, c).

    Per-key frequency in a window naively needs O(distinct keys) state; the
    CMS grid is the bounded replacement: ≤ CMS_D × CMS_W cells per open
    window, maintained by one streaming-legal append-mode
    groupBy((window, row, bucket)).count() — counts are algebraic, so Spark
    partial-merges them map-side. Cell rows are byte-identical to the batch
    twin's (operators/sketches.events_cms_daily — parity-tested); read
    heavy hitters off a finalized grid with sketches.cms_heavy_from_cells.
    """
    from harvester_spark.operators.sketches import cms_key_buckets

    keyed = events.select(
        "ts", F.posexplode(cms_key_buckets(F.col("key"))).alias("row", "bucket")
    )
    return (
        keyed.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("win"), "row", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
        .select(F.col("win.start").alias("window_start"), "row", "bucket", "c")
    )


def windowed_session_counts(
    events: DataFrame, gap: str = "30 minutes", late_threshold: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming events(ts, user_id) → finalized gap-based sessions via
    Spark's NATIVE session window (the third window mode next to the
    tumbling/sliding twins above): (user_id, session_start, session_end,
    n_events), session_end = last event + gap (Spark's half-open contract).

    This is the built-in counterpart of the two custom sessionizers the
    repo already carries — streaming/sessionize.py (applyInPandasWithState)
    and operators/relational.events_sessionize (batch lag/cumsum) — and is
    parity-tested against the batch one: identical sessions with
    session_end == batch max-ts + gap. Boundary note: session_window merges
    on diff < gap (half-open window), the batch twin on diff <= gap; they
    disagree only for a consecutive-event spacing of EXACTLY the gap
    (measure-zero on real timestamps; absent from the corpus by test).
    State is one (start, end, count) triple per open session — bounded by
    ACTIVE sessions, never by history.
    """
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_value_hist(
    events: DataFrame, window: str = WINDOW, late_threshold: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming events(ts, value) → watermarked per-window log-bucket
    histogram rows (window_start, b, cnt).

    Per-window quantiles naively need the full value multiset as state; the
    ~112-bucket log histogram (operators/sketches quantile sketch — 4-bit
    mantissa, integer bin()/shift bucketing) is the bounded replacement,
    and counts are algebraic so this is one streaming-legal append-mode
    groupBy((window, b)).count() with map-side partial merge. Bucket rows
    are byte-identical to the batch twin
    (operators/sketches.events_value_hist_hourly — parity-tested); read
    quantile estimates off a finalized histogram with the midpoint rule
    quantile_sketch_eval pins to <= 6.25% relative error.
    """
    from harvester_spark.operators.sketches import _qs_spark_bucket

    keyed = events.select(
        "ts", F.expr("CAST(round(value * 100) AS BIGINT)").alias("v")
    ).select("ts", F.expr(_qs_spark_bucket()).alias("b"))
    return (
        keyed.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("win"), "b")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "b", "cnt")
    )


def windowed_cascade_stats(
    events: DataFrame, window: str = WINDOW, late_threshold: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming events(ts, event_id) → watermarked per-window cascade
    click-model sufficient statistics (window_start, item, n_examined,
    n_clicked, alpha_hat_milli).

    The cascade session synthesis (slots, attraction draws, first-click)
    is computed ROW-LOCALLY with higher-order array functions inside
    :func:`harvester_spark.operators.click_models.cascade_impressions` —
    no per-session window touches the stream — so the only stateful
    operation is one watermarked tumbling-window groupBy over mergeable
    integer sums. Output rows are identical to the batch twin
    ``events_cascade_hourly`` (parity-tested with parquet chunks)."""
    from harvester_spark.operators.click_models import (
        _MILLI,
        cascade_impressions,
    )

    imp = cascade_impressions(events.select("ts", "event_id"))
    return (
        imp.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("win"), F.col("item"))
        .agg(
            F.count("*").cast("long").alias("n_examined"),
            F.sum("clicked").cast("long").alias("n_clicked"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "item",
            "n_examined",
            "n_clicked",
            F.expr(
                f"CAST(({_MILLI} * n_clicked) DIV n_examined AS BIGINT)"
            ).alias("alpha_hat_milli"),
        )
    )
