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


def test_anomaly_zscore_discriminates(spark):
    from harvester_spark.operators.relational import events_anomaly_zscore

    out = events_anomaly_zscore(spark, SF)
    n = out.count()
    anom = out.filter("is_anomaly").count()
    # both outcomes occur, anomalies are the minority, baselines densified
    assert 0 < anom < 0.1 * n
    assert out.filter(F.col("z_micro").isNull()).count() == 0
    # a zero-count hour in a dense series must carry a NEGATIVE z
    neg = out.filter((F.col("c") == 0) & (F.col("z_micro") < 0)).count()
    assert neg > 0


def test_anomaly_baseline_excludes_current_hour(spark, tmp_path):
    from harvester_spark.operators.relational import events_anomaly_zscore

    # 25 hours of flat counts then one spike: the spike hour's z must be
    # large positive, and the spike must NOT deflate its own baseline
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(26):
        # "flat": constant baseline (zero variance); "var": alternating 1/3
        for etype, n in (
            ("flat", 2 if h < 25 else 12),
            ("var", (1 if h % 2 else 3) if h < 25 else 12),
        ):
            for i in range(n):
                ts = base + datetime.timedelta(hours=h, minutes=5 + i)
                rows.append((eid, ts, 1, etype, 1.0, "{}"))
                eid += 1
    d = str(tmp_path / "anom")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        (r.event_type, r.hour_bucket): r
        for r in events_anomaly_zscore(spark, d).collect()
    }
    spike = max(h for _, h in out)
    # constant baseline -> zero variance -> z undefined, but the deviation
    # is still flagged (the flat_dev branch)
    assert out[("flat", spike)].z_micro is None and out[("flat", spike)].is_anomaly
    # varying baseline -> a real z, large positive at the spike
    assert out[("var", spike)].z_micro > 3_000_000 and out[("var", spike)].is_anomaly
    flat = min(h for _, h in out)
    assert out[("flat", flat)].z_micro is None and not out[("flat", flat)].is_anomaly
    assert not out[("var", flat)].is_anomaly


def test_lexical_diversity_semantics_and_plan(spark, tmp_path):
    from harvester_spark.operators.fulltext_queries import ft_lexical_diversity

    d = str(tmp_path / "lex")
    spark.createDataFrame(
        [
            (1, "a b a c b d", "en", "s", 11),   # types {a,b,c,d}, hapax {c,d}
            (2, "x x x x", "en", "s", 7),         # 1 type, 0 hapax
            (3, "unique words only here", "en", "s", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in ft_lexical_diversity(spark, d).collect()}
    assert (out[1].n_tokens, out[1].n_types, out[1].n_hapax) == (6, 4, 2)
    assert (out[2].n_types, out[2].n_hapax) == (1, 0)
    assert out[3].ttr == 1.0 and out[3].hapax_ratio == 1.0
    # map-only: zero exchanges
    df = ft_lexical_diversity(spark, SF)
    assert "Exchange" not in _plan(df)
