"""Scan-shaped plan guards: predicates reach the parquet scan; tails are
TakeOrdered, never a global sort or window."""

SF_DIR = "/root/testdata/sf0.001"


def test_q6_pushes_every_predicate_to_the_scan(spark):
    from harvester_spark.operators.relational import q6_forecast_revenue

    # plan strings truncate scan metadata at 100 chars by default, which
    # hides the tail of the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = q6_forecast_revenue(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PushedFilters" in plan
    for pred in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pred in plan, pred
    # no join, no hash exchange — one scan, one scalar agg
    assert "Exchange hashpartitioning" not in plan
    row = df.first()
    assert row["n_rows"] > 0 and row["revenue_cents"] > 0  # band binds


def test_search_after_cursor_is_takeordered_with_pushdown(spark):
    from harvester_spark.operators.relational import t7_search_after

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = t7_search_after(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    # the cursor disjunction reaches the scan (row-group min/max pruning)
    assert "PushedFilters" in plan and "Or(LessThan(ts" in plan
    # page-after-cursor is per-partition heaps + driver merge of k —
    # no global sort, no window, no shuffle
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan and "Window" not in plan
    assert df.count() == 20
