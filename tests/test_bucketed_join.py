"""Bucketed co-located join: the shuffle-free big-join strategy for 100 TB.

At scale the orders⋈lineitem-class joins are pre-bucketed on the join key so
neither side shuffles at query time (SURVEY.md brief: "bucketing for
co-located joins"). This test materializes both tables bucketed by key and
asserts the join plan contains NO Exchange on either side, and that results
equal the plain-join results.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_root):
    # warehouse.dir is static; park the bucketed tables in a tmp-located DB
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_root}/warehouse'")
    spark.sql("USE bucketdb")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("USE default")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    orders, li = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_c"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        # the scans feeding the join must not reshuffle (bucket pruning works)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        before_agg = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain(spark, bucketed):
    orders, li = bucketed
    plain_o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    plain_l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

    def agg(o, l):
        return (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_c"))
            .orderBy("o_orderstatus")
            .collect()
        )

    assert agg(orders, li) == agg(plain_o, plain_l)
