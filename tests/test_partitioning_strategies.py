"""Cluster-scale partitioning strategies, evidenced on local mode:

- bucketed tables co-locate a fact⋈fact join — the big-join shuffle
  disappears entirely (the 100 TB answer to "lineitem joins orders on
  every query": bucket both by orderkey at write time, pay the shuffle
  once, join shuffle-free forever after);
- AQE splits a skewed shuffle partition at runtime (the hot-key mitigation
  the engine relies on wherever salting isn't hand-rolled).

Both are assertions on the physical plan, not timings — co-tenant noise
can't flake them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_zero_exchange(spark, tmp_root, no_broadcast):
    """orders ⋈ lineitem on orderkey, both bucketed+sorted by the join key
    into the same bucket count: the sort-merge join runs with NO Exchange
    (and no per-task Sort of the probe side) — the write-once layout that
    deletes the recurring fact-join shuffle at any scale."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_root}/bktdb.db'"
    )
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bktdb.orders_b")
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bktdb.lineitem_b")
        )
        ob = spark.table("bktdb.orders_b")
        lb = spark.table("bktdb.lineitem_b")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        assert j.count() > 0
        plan = _plan(j)
        # the join itself is sort-merge over the bucketed layout...
        assert "SortMergeJoin" in plan
        # ...and NO exchange feeds it: the only exchange in the whole plan
        # is the tiny 5-row aggregation shuffle after the join
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, join_part[:1500]

        # control: the same join over plain parquet DOES shuffle both sides
        jp = orders.join(li, orders.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        jp.count()
        ctrl = _plan(jp)
        ctrl_join = ctrl.split("SortMergeJoin", 1)[1] if "SortMergeJoin" in ctrl else ctrl
        assert "Exchange" in ctrl_join
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_aqe_splits_skewed_join_partition(spark, no_broadcast):
    """A hot key (99% of one side) must trigger AQE's skew-join split —
    the runtime re-plan marked `skew=true` on the sort-merge join. The
    thresholds are lowered to make the synthetic 200k-row skew visible;
    the assertion is on the FINAL adaptive plan."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        a = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        b = spark.range(0, 20_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = a.join(b, "k").select(F.sum(F.col("payload") + F.col("w")).alias("s"))
        j.collect()
        plan = _plan(j)
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
