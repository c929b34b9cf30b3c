"""Watermark semantics: in-order and acceptably-late events counted, events
beyond the watermark dropped; append mode emits only finalized windows."""

import json
import os

from harvester_spark.streaming.windowed import windowed_counts


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_watermark_drops_too_late(spark, tmp_root):
    drop = os.path.join(tmp_root, "win_drop")
    os.makedirs(drop, exist_ok=True)

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .json(drop)
        )
        q = (
            windowed_counts(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(tmp_root, "win_out"))
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp_root, "win_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: events in hours 10 and 12 → watermark persists at 11:30
    _write(
        os.path.join(drop, "b1.json"),
        [
            {"ts": "2024-01-01T10:05:00.000Z", "event_type": "click", "value": 1.0},
            {"ts": "2024-01-01T10:20:00.000Z", "event_type": "click", "value": 2.0},
            {"ts": "2024-01-01T12:00:00.000Z", "event_type": "view", "value": 1.0},
        ],
    )
    run_once()
    # run 2 (same checkpoint): an acceptably-late 11:45 event and a TOO-late
    # 10:30 event (watermark 12:00 - 30min = 11:30 → hour-10 is closed)
    _write(
        os.path.join(drop, "b2.json"),
        [
            {"ts": "2024-01-01T11:45:00.000Z", "event_type": "click", "value": 4.0},
            {"ts": "2024-01-01T10:30:00.000Z", "event_type": "click", "value": 8.0},
            {"ts": "2024-01-01T13:10:00.000Z", "event_type": "view", "value": 1.0},
        ],
    )
    run_once()
    out = spark.read.parquet(os.path.join(tmp_root, "win_out"))
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["value_c"])
        for r in out.collect()
    }
    # hour-10 click window finalized WITHOUT the too-late 10:30 event
    assert got[("2024-01-01 10:00:00", "click")] == (2, 300)
    # hour-11 window includes the acceptably-late 11:45 event
    assert got[("2024-01-01 11:00:00", "click")] == (1, 400)
    # hour-13 not emitted in append mode (watermark hasn't passed it)
    assert ("2024-01-01 13:00:00", "view") not in got


def test_streaming_hll_registers_match_batch(spark, tmp_root):
    """Register-level parity: the watermarked streaming HLL, fed the events
    table in two arbitrary chunks, must finalize byte-identical register
    rows to the batch operator for every closed window — and the shared
    fold then yields identical estimates."""
    import pyspark.sql.functions as F

    from harvester_spark.operators.sketches import (
        events_hll_hourly,
        hll_fold_registers,
        hll_registers,
    )
    from harvester_spark.streaming.windowed import windowed_user_hll

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "user_id")
    src = os.path.join(tmp_root, "hll_src")
    # two chunks in event-time order so the final watermark closes all but
    # the tail window
    ev.orderBy("ts").limit(600).coalesce(1).write.json(os.path.join(src, "b1"))
    ev.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.json(
        os.path.join(src, "b2")
    )

    stream = spark.readStream.schema("ts timestamp, user_id long").json(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(tmp_root, "hll_out")
    q = (
        windowed_user_hll(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select(
        (F.unix_timestamp("window_start") / 3600).cast("long").alias("hour_bucket"),
        "bucket",
        "r",
    )
    emitted_hours = {r["hour_bucket"] for r in got.select("hour_bucket").distinct().collect()}
    assert len(emitted_hours) > 100  # append mode finalized most windows

    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket")
    batch_reg = hll_registers(
        ev.select(hour, "user_id"), F.col("user_id").cast("string"), "hour_bucket"
    ).filter(F.col("hour_bucket").isin(list(emitted_hours)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch_reg.collect()))

    # the shared fold over streaming registers == the batch operator
    stream_est = {
        r["hour_bucket"]: r["est"]
        for r in hll_fold_registers(got, "hour_bucket").collect()
    }
    batch_est = {
        r["hour_bucket"]: r["est"]
        for r in events_hll_hourly(spark, sf_dir).collect()
        if r["hour_bucket"] in emitted_hours
    }
    assert stream_est == batch_est


def test_streaming_cms_cells_match_batch(spark, tmp_root):
    """Cell-level parity: the watermarked streaming CMS grid, fed the keyed
    event stream in two chunks, must finalize byte-identical cells to the
    batch operator's grid for every closed window — and the shared
    relational probe then yields identical heavy hitters."""
    import pyspark.sql.functions as F

    from harvester_spark.operators.sketches import (
        CMS_EV_DEN,
        DAY_S,
        cms_heavy_from_cells,
        cms_key_buckets,
        event_key,
        events_cms_daily,
    )
    from harvester_spark.streaming.windowed import windowed_key_cms

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "ts", event_key().alias("key")
    )
    src = os.path.join(tmp_root, "cms_src")
    ev.orderBy("ts").limit(600).coalesce(1).write.json(os.path.join(src, "b1"))
    ev.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.json(
        os.path.join(src, "b2")
    )

    stream = spark.readStream.schema("ts timestamp, key string").json(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(tmp_root, "cms_out")
    q = (
        windowed_key_cms(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select(
        (F.unix_timestamp("window_start") / DAY_S).cast("long").alias("day_bucket"),
        "row",
        "bucket",
        "c",
    )
    emitted = {r["day_bucket"] for r in got.select("day_bucket").distinct().collect()}
    assert len(emitted) > 20  # append mode finalized most daily windows

    day = F.floor(F.unix_timestamp("ts") / DAY_S).cast("long").alias("day_bucket")
    keyed = (
        ev.select(day, "key")
        .select(
            "day_bucket",
            "key",
            F.posexplode(cms_key_buckets(F.col("key"))).alias("row", "bucket"),
        )
        .filter(F.col("day_bucket").isin(list(emitted)))
    )
    batch_cells = keyed.groupBy("day_bucket", "row", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch_cells.collect())
    )

    # heavy hitters read off the STREAMED grid == the batch operator
    nd = (
        ev.select(day)
        .groupBy("day_bucket")
        .agg(F.count("*").cast("long").alias("n_day"))
    )
    stream_heavy = {
        (r.day_bucket, r.key, r.cms_est)
        for r in cms_heavy_from_cells(keyed, got, "day_bucket")
        .join(nd, "day_bucket")
        .filter(
            F.col("cms_est")
            >= F.expr(f"(n_day + {CMS_EV_DEN - 1}) DIV {CMS_EV_DEN}")
        )
        .select("day_bucket", "key", "cms_est")
        .collect()
    }
    batch_heavy = {
        (r.day_bucket, r.key, r.cms_est)
        for r in events_cms_daily(spark, sf_dir).collect()
        if r.day_bucket in emitted
    }
    assert stream_heavy == batch_heavy
    # the dominant synthesized key is heavy in every emitted window, and
    # the tail is not all-heavy (discrimination, both directions)
    heavy_days = {d for d, k, _ in batch_heavy if k == "hot"}
    assert len(heavy_days) > 0.9 * len(emitted)
    n_keys = (
        ev.select(day, "key").distinct().filter(F.col("day_bucket").isin(list(emitted))).count()
    )
    assert len(batch_heavy) < 0.5 * n_keys  # the tail is NOT all-heavy


def test_streaming_sliding_hll_matches_batch(spark, tmp_root):
    """Sliding-window mode: Spark's native window(ts, '1 day', '6 hours')
    in the stream must finalize register rows byte-identical to the batch
    operator's explicit SLIDE_FACTOR-fan-out — same alignment arithmetic,
    SLIDE_FACTOR x 256 bounded state per open span."""
    import pyspark.sql.functions as F

    from harvester_spark.operators.sketches import (
        hll_registers,
        sliding_starts,
    )
    from harvester_spark.streaming.windowed import windowed_user_hll

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "user_id")
    src = os.path.join(tmp_root, "shll_src")
    ev.orderBy("ts").limit(600).coalesce(1).write.json(os.path.join(src, "b1"))
    ev.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.json(
        os.path.join(src, "b2")
    )
    stream = spark.readStream.schema("ts timestamp, user_id long").json(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(tmp_root, "shll_out")
    q = (
        windowed_user_hll(stream, window="1 day", slide="6 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "shll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select(
        F.unix_timestamp("window_start").cast("long").alias("win_start"),
        "bucket",
        "r",
    )
    emitted = {r["win_start"] for r in got.select("win_start").distinct().collect()}
    assert len(emitted) > 20

    batch_reg = hll_registers(
        ev.select(F.explode(sliding_starts("ts")).alias("win_start"), "user_id"),
        F.col("user_id").cast("string"),
        "win_start",
    ).filter(F.col("win_start").isin(list(emitted)))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch_reg.collect())
    )


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_root):
    """Native session_window stream == batch lag/cumsum sessionizer on
    every finalized session (start, end+gap, count), including sessions
    whose events arrive split across micro-batches."""
    import pyspark.sql.functions as F

    from harvester_spark.operators.relational import (
        SESSION_GAP_MS,
        events_sessionize,
    )
    from harvester_spark.streaming.windowed import windowed_session_counts

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "user_id")
    # precondition for exact parity: no consecutive same-user spacing of
    # exactly the gap (the half-open vs closed boundary)
    from pyspark.sql import Window as W

    tms = F.unix_millis(F.col("ts").cast("timestamp"))
    diffs = ev.withColumn(
        "d", tms - F.lag(tms).over(W.partitionBy("user_id").orderBy("ts"))
    )
    assert diffs.filter(F.col("d") == SESSION_GAP_MS).count() == 0

    src = os.path.join(tmp_root, "swin_src")
    # parquet source: JSON would truncate the microsecond timestamps and
    # shift session boundaries off the batch twin's. Watermarks need a
    # zoned TIMESTAMP; the session tz is pinned UTC so the cast keeps
    # wall time (the events_sessionize tms contract).
    evz = ev.select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    evz.orderBy("ts").limit(600).coalesce(1).write.parquet(os.path.join(src, "b1"))
    evz.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(tmp_root, "swin_out")
    q = (
        windowed_session_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "swin_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, str(r.session_start), str(r.session_end)): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) > 50  # most sessions finalized

    batch = {
        (
            r.user_id,
            str(r.session_start),
            str(r.session_end + __import__("datetime").timedelta(
                milliseconds=SESSION_GAP_MS
            )),
        ): r.n_events
        for r in events_sessionize(spark, sf_dir).collect()
    }
    for k, n in got.items():
        assert batch.get(k) == n, k


def test_streaming_value_hist_matches_batch(spark, tmp_root):
    """Bucket-level parity for the quantile-sketch state: the watermarked
    streaming log-bucket histogram, fed the events table in two parquet
    chunks (parquet, not json — value doubles and ts micros must survive
    the round trip), finalizes rows byte-identical to the batch twin for
    every emitted hour. Histograms are mergeable by addition — asserted by
    re-summing the streamed rows across two adjacent hours against a
    batch histogram of their union."""
    import pyspark.sql.functions as F

    from harvester_spark.operators.sketches import events_value_hist_hourly
    from harvester_spark.streaming.windowed import windowed_value_hist

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "value")
    src = os.path.join(tmp_root, "vh_src")
    ev.orderBy("ts").limit(600).coalesce(1).write.parquet(os.path.join(src, "b1"))
    ev.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )

    stream = spark.readStream.schema("ts timestamp, value double").parquet(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(tmp_root, "vh_out")
    q = (
        windowed_value_hist(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "vh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select(
        (F.unix_timestamp("window_start") / 3600).cast("long").alias("hour_bucket"),
        "b",
        "cnt",
    )
    emitted = {r["hour_bucket"] for r in got.select("hour_bucket").distinct().collect()}
    assert len(emitted) > 20  # append mode finalized most windows

    batch = events_value_hist_hourly(spark, sf_dir).filter(
        F.col("hour_bucket").isin(list(emitted))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    # mergeability: streamed histograms of two adjacent hours ADD to the
    # batch histogram of those hours pooled
    hours = sorted(emitted)[:2]
    merged = {
        r["b"]: r["s"]
        for r in got.filter(F.col("hour_bucket").isin(hours))
        .groupBy("b")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    pooled = {
        r["b"]: r["s"]
        for r in batch.filter(F.col("hour_bucket").isin(hours))
        .groupBy("b")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    assert merged == pooled and merged
