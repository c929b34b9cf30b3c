"""Stateful streaming sessionization: applyInPandasWithState end-to-end."""

import json
import os

import pandas as pd
import pytest

from harvester_spark.streaming.sessionize import (
    _sessionize_pdf,
    sessionize,
    sessionize_batch_oracle,
)

US = 1_000_000
MIN = 60 * US


def test_pure_sessionizer():
    # two sessions split by a >30min gap; open state continues
    ts = [0, 5 * MIN, 50 * MIN, 55 * MIN]
    vals = [1.0, 2.0, 3.0, 4.0]
    closed, cur = _sessionize_pdf(ts, vals, 30 * MIN, None)
    assert closed == [(0, 5 * MIN, 2, 3.0)]
    assert cur == (50 * MIN, 55 * MIN, 2, 7.0)
    # resuming from open state merges
    closed2, cur2 = _sessionize_pdf([60 * MIN], [5.0], 30 * MIN, cur)
    assert closed2 == [] and cur2 == (50 * MIN, 60 * MIN, 3, 12.0)


def _write_events(path: str, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_sessionize(spark, tmp_root):
    drop = os.path.join(tmp_root, "sess_drop")
    os.makedirs(drop, exist_ok=True)
    base = "2024-01-01T00:{m:02d}:00.000Z"
    _write_events(
        os.path.join(drop, "b1.json"),
        [
            {"user_id": 1, "ts": base.format(m=0), "value": 1.0},
            {"user_id": 1, "ts": base.format(m=10), "value": 2.0},
            {"user_id": 2, "ts": base.format(m=5), "value": 5.0},
        ],
    )
    _write_events(
        os.path.join(drop, "b2.json"),
        [
            {"user_id": 1, "ts": "2024-01-01T02:00:00.000Z", "value": 7.0},
            {"user_id": 2, "ts": base.format(m=20), "value": 1.0},
        ],
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .json(drop)
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("select * from sessions").toPandas()
    # last update per (user_id, session_start) is the session's final state
    final = (
        got.sort_values(["n_events"])
        .groupby(["user_id", "session_start"], as_index=False)
        .last()
    )
    all_events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01T00:00:00Z",
                    "2024-01-01T00:10:00Z",
                    "2024-01-01T02:00:00Z",
                    "2024-01-01T00:05:00Z",
                    "2024-01-01T00:20:00Z",
                ]
            ).tz_localize(None),
            "value": [1.0, 2.0, 7.0, 5.0, 1.0],
        }
    )
    expect = sessionize_batch_oracle(all_events)
    f = final.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = expect.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(f) == len(e) == 3  # user1: 2 sessions, user2: 1 session
    assert list(f["user_id"]) == list(e["user_id"])
    assert list(f["n_events"]) == list(e["n_events"])
    assert list(f["total_value"]) == list(e["total_value"])


def test_pure_sessionizer_out_of_order_and_stragglers():
    """Round-3 fix: interval-merge semantics for cross-batch late data.

    - a late event within gap of the open session extends it BACKWARDS
      (min session_start), matching the batch oracle;
    - an ancient straggler becomes its own immediately-closed session
      (the old forward fold folded it in: any negative t-end passed <= gap);
    - two nearby stragglers cluster together."""
    gap = 30 * MIN
    # open session [100, 110]
    open_s = (100 * MIN, 110 * MIN, 2, 5.0)
    # late event at 80 (within gap of start 100): extends backwards
    closed, cur = _sessionize_pdf([80 * MIN], [1.0], gap, open_s)
    assert closed == [] and cur == (80 * MIN, 110 * MIN, 3, 6.0)
    # ancient stragglers at 0 and 10 (far before start-gap): ONE closed
    # straggler session, open session untouched
    closed, cur = _sessionize_pdf([0, 10 * MIN], [1.0, 2.0], gap, open_s)
    assert closed == [(0, 10 * MIN, 2, 3.0)]
    assert cur == open_s
    # mixed batch: straggler + backward extension + forward extension
    closed, cur = _sessionize_pdf(
        [0, 85 * MIN, 120 * MIN], [1.0, 1.0, 1.0], gap, open_s
    )
    assert closed == [(0, 0, 1, 1.0)]
    # 4 events: late 85 + state's 2 + forward 120 (the straggler took one)
    assert cur == (85 * MIN, 120 * MIN, 4, 7.0)


def test_streaming_sessionize_out_of_order_batches(spark, tmp_root):
    """Multi-batch streaming with a LATE cross-batch event: the final
    update row equals the batch oracle over the union of all events."""
    drop = os.path.join(tmp_root, "sess_ooo_drop")
    os.makedirs(drop, exist_ok=True)
    _write_events(
        os.path.join(drop, "b1.json"),
        [
            {"user_id": 9, "ts": "2024-01-01T01:00:00.000Z", "value": 1.0},
            {"user_id": 9, "ts": "2024-01-01T01:10:00.000Z", "value": 2.0},
        ],
    )
    # batch 2 delivers an event EARLIER than the open session (late by 20min)
    _write_events(
        os.path.join(drop, "b2.json"),
        [{"user_id": 9, "ts": "2024-01-01T00:45:00.000Z", "value": 4.0}],
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .json(drop)
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_ooo")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "sess_ooo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sessions_ooo").toPandas()
    # the final (max n_events) update row is the true merged session
    final = got.sort_values("n_events").iloc[-1]
    all_events = pd.DataFrame(
        {
            "user_id": [9, 9, 9],
            "ts": pd.to_datetime(
                ["2024-01-01T01:00:00Z", "2024-01-01T01:10:00Z",
                 "2024-01-01T00:45:00Z"]
            ).tz_localize(None),
            "value": [1.0, 2.0, 4.0],
        }
    )
    e = sessionize_batch_oracle(all_events)
    assert len(e) == 1
    assert final["session_start"] == e["session_start"].iloc[0]
    assert final["session_end"] == e["session_end"].iloc[0]
    assert final["n_events"] == e["n_events"].iloc[0]
    assert final["total_value"] == e["total_value"].iloc[0]
