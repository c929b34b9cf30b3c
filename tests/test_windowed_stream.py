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
