"""Z-order layout: Morton-code correctness and clustering quality."""

from pyspark.sql import functions as F

from harvester_spark.operators.relational import (
    _interleave_expr,
    zorder_layout,
)

SF = "/root/testdata/sf0.001"


class TestMortonCode:
    def test_interleave_known_values(self, spark):
        rows = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (3, 3, 15), (65535, 65535, (1 << 32) - 1)]
        df = spark.createDataFrame(
            [(x, y) for x, y, _ in rows], "sx long, sy long"
        ).withColumn("z", F.expr(_interleave_expr("sx", "sy", "DIV")).cast("long"))
        got = [r.z for r in df.collect()]
        assert got == [z for _, _, z in rows]

    def test_locality_beats_lexicographic(self, spark):
        # (1,1) must be closer in z to (0,0) than (0, 256) is — bit
        # interleaving weights both dims, lexicographic ordering does not
        df = spark.createDataFrame(
            [(0, 0), (1, 1), (0, 256)], "sx long, sy long"
        ).withColumn("z", F.expr(_interleave_expr("sx", "sy", "DIV")).cast("long"))
        z = {(r.sx, r.sy): r.z for r in df.collect()}
        assert abs(z[(1, 1)] - z[(0, 0)]) < abs(z[(0, 256)] - z[(0, 0)])


class TestZorderLayout:
    def _fracs(self, rows, full):
        return [
            ((r.max_ck - r.min_ck) * (r.max_day - r.min_day)) / full for r in rows
        ]

    def test_files_prune_both_dims(self, spark):
        o = spark.read.parquet(f"{SF}/orders.parquet").select(
            "o_orderkey",
            F.col("o_custkey").alias("ck"),
            F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("d"),
        )
        st = o.agg(
            F.min("ck"), F.max("ck"), F.min("d"), F.max("d")
        ).collect()[0]
        full = (st[1] - st[0]) * (st[3] - st[2])

        zrows = zorder_layout(spark, SF).collect()
        assert len(zrows) > 1  # derived file count non-degenerate at test scale
        zfrac = self._fracs(zrows, full)

        # row-order baseline: same file sizes, assignment by o_orderkey
        ro = (
            o.withColumn("file_id", F.expr("o_orderkey DIV 250"))
            .groupBy("file_id")
            .agg(
                F.min("ck").alias("min_ck"), F.max("ck").alias("max_ck"),
                F.min("d").alias("min_day"), F.max("d").alias("max_day"),
            )
            .collect()
        )
        rofrac = self._fracs(ro, full)
        z_mean = sum(zfrac) / len(zfrac)
        ro_mean = sum(rofrac) / len(rofrac)
        # measured: 0.31 vs ~1.0 at sf0.001 — pin with margin
        assert z_mean < 0.5
        assert z_mean < 0.5 * ro_mean

    def test_file_sizes_balanced(self, spark):
        rows = zorder_layout(spark, SF).collect()
        n = sum(r.n_rows for r in rows)
        for r in rows:
            assert r.n_rows < 2 * (n / len(rows))
