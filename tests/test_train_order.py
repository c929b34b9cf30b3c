"""Deterministic training-order shuffle: reproducibility + shard shape."""

from pyspark.sql import functions as F

from harvester_spark.operators.training_prep import (
    DOCS_PER_SHARD,
    train_order_shuffle,
)

SF = "/root/testdata/sf0.001"


class TestTrainOrderShuffle:
    def test_partitioning_independent(self, spark, tmp_path):
        # identical permutation no matter how the input files are laid out
        base = {
            (r.doc_id, r.shard, r.pos)
            for r in train_order_shuffle(spark, SF).collect()
        }
        d = str(tmp_path / "relaid")
        spark.read.parquet(f"{SF}/documents.parquet").repartition(
            7, "lang"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        relaid = {
            (r.doc_id, r.shard, r.pos)
            for r in train_order_shuffle(spark, d).collect()
        }
        assert base == relaid

    def test_shard_capacity_derived(self, spark):
        out = train_order_shuffle(spark, SF)
        n = out.count()
        shards = out.select("shard").distinct().count()
        assert shards == max(n // DOCS_PER_SHARD, 1)
        assert shards > 1  # non-degenerate at test scale

    def test_pos_contiguous_within_shard(self, spark):
        per = (
            train_order_shuffle(spark, SF)
            .groupBy("shard")
            .agg(
                F.count("*").alias("n"),
                F.min("pos").alias("lo"),
                F.max("pos").alias("hi"),
                F.countDistinct("pos").alias("d"),
            )
            .collect()
        )
        for r in per:
            assert (r.lo, r.hi, r.d) == (1, r.n, r.n)

    def test_order_is_shuffled_not_docid(self, spark):
        # within a shard the order must not be doc_id order (a real shuffle)
        rows = (
            train_order_shuffle(spark, SF)
            .filter(F.col("shard") == 0)
            .orderBy("pos")
            .collect()
        )
        ids = [r.doc_id for r in rows]
        assert ids != sorted(ids)
