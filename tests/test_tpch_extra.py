"""Q3/Q18 shapes: broadcast dims, TakeOrdered top-k, non-degeneracy."""

from pyspark.sql import functions as F

from harvester_spark.operators.relational import (
    Q18_QTY_C,
    q3_shipping_priority,
    q18_large_volume_customers,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_plan_and_results(spark):
    df = q3_shipping_priority(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan          # customer dim broadcast
    assert "TakeOrderedAndProject" in plan      # top-10, no global sort
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue_c for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q18_having_prunes_before_join(spark):
    df = q18_large_volume_customers(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert rows, "threshold too high for test scale"
    assert all(r.sum_qty_c > Q18_QTY_C for r in rows)
    # discrimination: qualifying orders are a small minority
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert len(rows) < 0.1 * n_orders
