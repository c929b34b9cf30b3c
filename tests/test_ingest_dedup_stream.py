"""Cross-batch exactly-once: dropDuplicatesWithinWatermark parity.

Two parquet chunks OVERLAP by construction (the at-least-once redelivery
shape), so real duplicate rows span micro-batches; the stream must emit
exactly the batch-distinct set — no dupes, no drops.
"""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dedup_drops_cross_batch_redeliveries_exactly(spark, tmp_root):
    from harvester_spark.streaming.ingest_dedup import (
        INGEST_DEDUP_DELAY,
        dedup_events,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    n = ev.count()
    k = n * 6 // 10
    j = n * 4 // 10  # chunk 2 starts at 40% → 20% of rows are redelivered
    ordered = ev.orderBy("ts", "event_id")
    b1 = ordered.limit(k)
    b2 = ordered.offset(j)

    # preconditions: the overlap is real and sits inside the delay horizon
    assert b1.count() + b2.count() > n
    import datetime

    span = b2.agg(F.min("ts")).first()[0], b1.agg(F.max("ts")).first()[0]
    assert span[1] - span[0] < datetime.timedelta(days=10)
    assert INGEST_DEDUP_DELAY == "10 days"

    src = os.path.join(tmp_root, "ingdedup_src")
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "b2"))

    expected = {
        (r.event_id, r.user_id, r.event_type, r.ts)
        for r in dedup_events(ev).collect()
    }
    assert len(expected) == n  # event_id unique in the base corpus

    # one file per micro-batch: the duplicates MUST cross batches, so the
    # dedup exercises the state store, not within-batch distinct
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    out = os.path.join(tmp_root, "ingdedup_out")
    q = (
        dedup_events(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "ingdedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = [
        (r.event_id, r.user_id, r.event_type, r.ts)
        for r in spark.read.parquet(out).collect()
    ]
    assert len(got) == len(set(got)) == n  # exactly once, nothing dropped
    assert set(got) == expected
