"""TPC-H Q6: every predicate must reach the parquet scan."""

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
