"""Stream-stream interval join parity: streaming attribution == batch twin.

The same attribution_pairs function runs once over batch frames and once
over two chunked parquet streams (stream-stream inner join with
watermarks); the emitted pair sets must be identical. Parquet chunks, not
JSON — JSON truncates microsecond timestamps and lag_us would shift.
"""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
# Widened beyond the serving default (3600 s) so sf0.001 yields a real
# pair set AND purchases pair with clicks from EARLIER micro-batches —
# exercising cross-batch join state, not just within-batch matches.
WINDOW_S = 86400


def _sides(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    buys = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    return clicks, buys


def test_stream_stream_attribution_matches_batch(spark, tmp_root):
    from harvester_spark.streaming.attribution import attribution_pairs

    clicks, buys = _sides(spark)
    expected = {
        (r.user_id, r.purchase_id, r.click_id, r.lag_us)
        for r in attribution_pairs(clicks, buys, window_s=WINDOW_S).collect()
    }
    assert len(expected) > 50  # non-degenerate at this sf

    src_c = os.path.join(tmp_root, "attr_clicks")
    src_p = os.path.join(tmp_root, "attr_buys")
    for df, src in ((clicks, src_c), (buys, src_p)):
        n = df.count()
        k = n * 3 // 5
        df.orderBy("ts").limit(k).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        df.orderBy(F.col("ts").desc()).limit(n - k).coalesce(1).write.parquet(
            os.path.join(src, "b2")
        )

    schema = "event_id long, user_id long, ts timestamp"
    sc = spark.readStream.schema(schema).parquet(os.path.join(src_c, "*"))
    sp = spark.readStream.schema(schema).parquet(os.path.join(src_p, "*"))
    out = os.path.join(tmp_root, "attr_out")
    q = (
        attribution_pairs(sc, sp, window_s=WINDOW_S)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "attr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.purchase_id, r.click_id, r.lag_us)
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected


def test_attribution_batch_plan_has_no_nested_loop(spark):
    """The equality conjunct must key the join — a BNLJ here is the
    quadratic scale-killer the bucketed form exists to avoid."""
    from harvester_spark.streaming.attribution import attribution_pairs

    clicks, buys = _sides(spark)
    plan = attribution_pairs(clicks, buys)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_last_touch_attribution_is_one_shuffle_no_joins(spark):
    """The union-window plan must stay: exactly ONE user-keyed exchange
    and zero joins — the same-second click tie-break rides the carry
    window's order, not a separate dedup aggregation."""
    from harvester_spark.operators.relational import events_attribution

    plan = (
        events_attribution(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in plan
