"""Largest-remainder crawl-budget apportionment: exactness invariants."""

from pyspark.sql import functions as F

from harvester_spark.operators.graph import allocate_budget, crawl_budget_allocate

SF = "/root/testdata/sf0.001"


def _pr(spark, rows):
    return spark.createDataFrame(rows, "host string, rank_unit long")


class TestAllocateBudget:
    def test_sums_exactly_to_budget(self, spark):
        out = crawl_budget_allocate(spark, SF)
        from harvester_spark.operators.graph import CRAWL_BUDGET

        agg = out.agg(
            F.sum("quota").alias("q"), F.max("extra").alias("mx"),
            F.min("extra").alias("mn"), F.sum("extra").alias("ex"),
        ).collect()[0]
        assert agg.q == CRAWL_BUDGET
        assert agg.mn in (0, 1) and agg.mx in (0, 1)

    def test_monotone_in_rank(self, spark):
        rows = sorted(
            crawl_budget_allocate(spark, SF).collect(),
            key=lambda r: (-r.rank_unit, r.host),
        )
        for hi, lo in zip(rows, rows[1:]):
            if hi.rank_unit > lo.rank_unit:
                assert hi.quota >= lo.quota

    def test_zero_leftover_path(self, spark):
        # W = 4, budget 8 -> every base is exact, L == 0, no extras
        out = allocate_budget(
            spark, _pr(spark, [("a", 1), ("b", 1), ("c", 2)]), 8
        ).collect()
        got = {r.host: (r.base_quota, r.extra, r.quota) for r in out}
        assert got == {"a": (2, 0, 2), "b": (2, 0, 2), "c": (4, 0, 4)}

    def test_remainder_tie_breaks_host_asc(self, spark):
        # W = 3, budget 4: every host has base 1 rem 1 — ONE extra seat,
        # and it must go to the lexicographically smallest host
        out = allocate_budget(
            spark, _pr(spark, [("c", 1), ("a", 1), ("b", 1)]), 4
        ).collect()
        got = {r.host: r.quota for r in out}
        assert got == {"a": 2, "b": 1, "c": 1}

    def test_largest_remainders_win(self, spark):
        # budget 10, W=10: ranks 1,2,3,4 -> exact, then budget 11 gives the
        # extra seat to the largest remainder (all rem equal -> host asc)
        out = allocate_budget(
            spark,
            _pr(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)]),
            13,
        ).collect()
        got = {r.host: r.quota for r in out}
        # 13*r/10: a=1 rem 3, b=2 rem 6, c=3 rem 9, d=5 rem 2; base sum 11,
        # L=2 -> extras to c (rem 9) and b (rem 6)
        assert got == {"a": 1, "b": 3, "c": 4, "d": 5}
        assert sum(got.values()) == 13
