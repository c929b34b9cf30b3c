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


class TestIctPairs:
    def _one(self, spark, tmp_path, text, doc_id=1):
        from harvester_spark.operators.training_prep import ict_pairs

        d = str(tmp_path / "ict")
        spark.createDataFrame(
            [(doc_id, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return ict_pairs(spark, d).collect()[0]

    def test_span_excised_exactly(self, spark, tmp_path):
        import hashlib

        r = self._one(spark, tmp_path, "a b c d e f g h i j")
        toks = "a b c d e f g h i j".split()
        q = toks[r.q_start : r.q_start + 4]
        ctx = toks[: r.q_start] + toks[r.q_start + 4 :]
        assert r.query == " ".join(q)
        assert r.n_ctx == len(ctx) == 6
        assert r.ctx_md5 == hashlib.md5(" ".join(ctx).encode()).hexdigest()
        assert 0 <= r.q_start <= len(toks) - 4

    def test_overlap_counts_distinct_shared_terms(self, spark, tmp_path):
        # force q_start by trying doc_ids until the span is known — instead
        # craft a doc where EVERY 4-token span shares exactly its repeated
        # terms with the rest: all tokens identical -> overlap == 1
        r = self._one(spark, tmp_path, "x x x x x x x x")
        assert r.overlap == 1

    def test_map_only_plan(self, spark):
        from harvester_spark.operators.training_prep import ict_pairs

        df = ict_pairs(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_corpus_queries_nondegenerate(self, spark):
        from harvester_spark.operators.training_prep import ict_pairs

        out = ict_pairs(spark, "/root/testdata/sf0.001")
        # span starts must vary (a constant q_start would mean the hash is
        # degenerate) and contexts must be non-empty
        assert out.select(F.countDistinct("q_start")).collect()[0][0] > 10
        assert out.filter(F.col("n_ctx") == 0).count() == 0


def test_mlm_mask_plan_ratios_and_determinism(spark):
    """Corpus-level 15% selection and 80/10/10 split within tolerance; all
    categories populated; per-doc accounting internally consistent."""
    from harvester_spark.operators.training_prep import mlm_mask_plan

    rows = mlm_mask_plan(spark, "/root/testdata/sf0.001").collect()
    nt = sum(r["n_tokens"] for r in rows)
    ns = sum(r["n_selected"] for r in rows)
    nm = sum(r["n_mask"] for r in rows)
    nr = sum(r["n_random"] for r in rows)
    nk = sum(r["n_keep"] for r in rows)
    assert nt > 500 and ns > 0 and nm > 0 and nr > 0 and nk > 0
    assert nm + nr + nk == ns
    assert abs(ns / nt - 0.15) < 0.03
    assert abs(nm / ns - 0.80) < 0.08
    for r in rows:
        assert r["n_mask"] + r["n_random"] + r["n_keep"] == r["n_selected"]
        assert r["n_selected"] <= r["n_tokens"]
