"""Sketch-operator properties the oracle gate can't see.

The DuckDB oracles pin cross-engine value identity; these tests pin the
*semantic* guarantees (HLL accuracy, CMS no-false-negatives, Bloom
no-misses) and the plan shapes (the vocabulary must never shuffle on the
sketch paths) — the "correct but scale-killer => weak" rule.
"""

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators import sketches

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------- HyperLogLog


def test_hll_estimate_within_error_bound(spark):
    out = {r["lang"]: r for r in sketches.hll_distinct_shingles(spark, SF_DIR).collect()}
    exact = {
        r["lang"]: r["n"]
        for r in sketches._shingle_stream(spark, SF_DIR, "lang")
        .groupBy("lang")
        .agg(F.countDistinct("shingle").alias("n"))
        .collect()
    }
    assert set(out) == set(exact) and len(exact) >= 3
    for lang, ex in exact.items():
        est = out[lang]["est"]
        # std error = 1.04/sqrt(256) = 6.5%; 3 sigma ~= 20%
        assert abs(est - ex) / ex < 0.20, (lang, est, ex)
        # non-degenerate cardinality: the shingle domain must be in the
        # thousands, not the ~31-term raw vocabulary
        assert ex > 500, (lang, ex)


def test_hll_plan_never_shuffles_the_stream_by_shingle(spark):
    plan = _plan(sketches.hll_distinct_shingles(spark, SF_DIR))
    assert "hashpartitioning(shingle" not in plan
    # register file: one (lang, bucket) exchange + one (lang) exchange only
    assert plan.count("Exchange hashpartitioning") == 2


# -------------------------------------------------- count-min heavy hitters


@pytest.fixture(scope="module")
def cms_rows(spark):
    return sketches.cms_heavy_hitters(spark, SF_DIR).collect()


def test_cms_never_undercounts_and_finds_planted_banners(spark, cms_rows):
    assert all(r["cms_est"] >= r["exact_cnt"] for r in cms_rows)
    got = {r["shingle"] for r in cms_rows}
    assert set(sketches._BANNERS) <= got  # the planted heavy hitters
    # the sketch must actually FILTER: candidates are a sliver of the
    # distinct-shingle universe (non-degenerate in the other direction)
    universe = (
        sketches._banner_shingles(spark, SF_DIR).distinct().count()
    )
    assert len(cms_rows) < universe * 0.01, (len(cms_rows), universe)


def test_cms_exact_counts_are_true_counts(spark, cms_rows):
    stream = sketches._banner_shingles(spark, SF_DIR)
    truth = {
        r["shingle"]: r["c"]
        for r in stream.groupBy("shingle").agg(F.count("*").alias("c")).collect()
    }
    for r in cms_rows:
        assert truth[r["shingle"]] == r["exact_cnt"]


def test_cms_plan_filters_before_the_shingle_shuffle(spark):
    plan = _plan(sketches.cms_heavy_hitters(spark, SF_DIR))
    # exactly ONE shingle-keyed exchange (the post-filter exact groupBy);
    # the estimate is attached map-side via the broadcast one-row grid
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan
    # the threshold filter must sit BELOW the exchange (printed after it
    # in the top-down plan dump)
    exch = plan.index("Exchange hashpartitioning")
    filt = plan.index("Filter")
    assert filt > exch, "heavy-hitter filter must run before the shuffle"


# ------------------------------------------------------ Bloom novelty probe


@pytest.fixture(scope="module")
def bloom_rows(spark):
    return sketches.bloom_snapshot_novelty(spark, SF_DIR).collect()


def test_bloom_never_misses(bloom_rows):
    assert len(bloom_rows) > 50
    for r in bloom_rows:
        assert 0 <= r["n_exact_seen"] <= r["n_bloom_seen"] <= r["n_shingles"]


def test_bloom_false_positive_rate_bounded(bloom_rows):
    fp = sum(r["n_bloom_seen"] - r["n_exact_seen"] for r in bloom_rows)
    probes = sum(r["n_shingles"] for r in bloom_rows)
    # 8 bits/key, k=3 -> ~3% worst case; allow 5%
    assert fp / probes < 0.05, (fp, probes)


def test_bloom_is_non_degenerate_both_directions(bloom_rows):
    seen = sum(r["n_exact_seen"] for r in bloom_rows)
    novel = sum(r["n_shingles"] - r["n_exact_seen"] for r in bloom_rows)
    assert seen > 0 and novel > 0


def test_bloom_capacity_derivation_is_integer_exact():
    # power-of-two boundaries — exactly where float log2 would diverge
    assert sketches.derive_bloom_m(0) == 64
    assert sketches.derive_bloom_m(8) == 64  # 8n-1 = 63 -> 6 bits
    assert sketches.derive_bloom_m(9) == 128  # 8n-1 = 71 -> 7 bits
    assert sketches.derive_bloom_m(1 << 20) == 1 << 23
    assert sketches.derive_bloom_m((1 << 20) + 1) == 1 << 24


class TestSnapshotDriftKL:
    def test_identity_snapshot_zero_drift(self, spark, tmp_path):
        from harvester_spark.operators.sketches import snapshot_drift_kl

        # doc_ids chosen so the synthesis drops/relabels NOTHING:
        # snapshot == base -> every KL term is ln(1) == 0 exactly
        d = str(tmp_path / "drift0")
        spark.createDataFrame(
            [(i, "t", "en", f"s{i % 2}", 1) for i in (1, 2, 3, 4, 6)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = snapshot_drift_kl(spark, d).collect()
        assert rows and all(r.kl_micronat == 0 for r in rows)

    def test_corpus_drift_positive(self, spark):
        from harvester_spark.operators.sketches import snapshot_drift_kl

        rows = snapshot_drift_kl(spark, "/root/testdata/sf0.001").collect()
        assert rows
        # the synthesized shift must register: drift > 0 for every lang,
        # and the new category is counted
        assert all(r.kl_micronat > 0 for r in rows)
        assert all(r.n_cats > 1 for r in rows)
        assert all(r.n_snap < r.n_base for r in rows)


def test_hll_error_eval_bounded_and_exercises_both_branches(spark):
    """Measured HLL error must stay within ~3 sigma (1.04/sqrt(256) = 6.5%)
    at every nested cardinality, and the four scales must cover BOTH
    estimator branches (raw harmonic-mean HLL on the big subsets, the
    LinearCounting small-range correction on the small ones). A correlated
    subset hash collapses the register file and fails the 20% bound by an
    order of magnitude (est 74 vs exact 4112) — this test is the guard."""
    rows = {r["scale"]: r for r in sketches.hll_error_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(sketches._HLL_EVAL_SCALES)
    for s, r in rows.items():
        assert r["exact"] > 0
        assert r["err_micro"] <= 200_000, (s, dict(r.asDict()))
    # nested subsets: cardinality must strictly decrease with scale
    exacts = [rows[s]["exact"] for s in sorted(rows)]
    assert exacts == sorted(exacts, reverse=True) and exacts[0] > exacts[-1]
    # branch coverage: smallest subset under the LC cutoff, largest above
    assert rows[max(rows)]["exact"] < 2.5 * sketches.HLL_M
    assert rows[1]["exact"] > 2.5 * sketches.HLL_M


def test_quantile_sketch_error_within_mantissa_bound(spark):
    """The histogram sketch's midpoint estimate must stay within the 4-bit
    mantissa's 2^-4 = 6.25% relative-error guarantee at every probed
    percentile, on ground truth from the exact order statistic."""
    rows = {r["q_pct"]: r for r in sketches.quantile_sketch_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(sketches.QS_PCTS)
    for q, r in rows.items():
        assert r["exact_cents"] > 0
        assert r["err_micro"] <= 62_500, (q, dict(r.asDict()))
    # non-degenerate: percentiles must actually spread across buckets
    assert len({r["est_cents"] for r in rows.values()}) == len(rows)
