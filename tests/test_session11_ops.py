"""Semantics + plan guards for session-11 operators.

What each test pins:
- SQ8: the quantizer is recomputed end-to-end in pure Python (stats,
  codes, midpoint reconstruction, ADC) and must match the Spark kernel
  bit-for-bit — the codec-parity discipline of postings_codec_compare.
  Recall vs the exact-cosine truth must clear the measured floor (>= 0.6;
  observed 0.8-1.0), i.e. SQ8 must stay the high-fidelity rung above PQ.
- terms_shard_error_eval: the ES contract — merged counts never exceed
  exact counts, the true undercount never exceeds
  doc_count_error_upper_bound, and the eval is NON-degenerate (some term
  is actually undercounted; a sharding that hides no counts proves
  nothing).
- recrawl_schedule: λ̂ = 0 iff no observed change, intervals respect the
  cap, and the estimator actually discriminates (a constant interval
  column would schedule nothing).
- docid_reorder_gain: content-sorted numbering must cost strictly fewer
  gap bits than hash numbering on identical postings — the whole point
  of the reorder; equality means the fingerprint sort degenerated.
- url_path_templates: templates aggregate (fewer templates than URLs,
  every URL accounted for) — the 1:1-mirror trap.
- ltr_pointwise_topk: the blend must genuinely reorder vs raw BM25
  (otherwise the feature vector is dead weight) while staying monotone
  in its own score.
- ranker_agreement_eval: tau bounds, pair accounting (conc + disc ==
  C(n_common, 2) — no silently dropped pairs), and real disagreement
  between the two ranking families.
"""

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------- SQ8


def test_sq8_matches_pure_python_requantization(spark):
    from harvester_spark.operators.similarity import (
        _KM_SCALE,
        N_QUERIES,
        SQ8_LEVELS,
        TOP_K,
        sq8_adc_topk,
    )
    from harvester_spark.operators.common import load

    emb = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    ivec = {
        vid: [int(round(v * _KM_SCALE)) for v in vec] for vid, vec in emb.items()
    }
    dim = len(next(iter(ivec.values())))
    mn = [min(v[p] for v in ivec.values()) for p in range(dim)]
    span = [
        max(max(v[p] for v in ivec.values()) - mn[p], 1) for p in range(dim)
    ]
    recon = {
        vid: [
            mn[p]
            + ((2 * (((v[p] - mn[p]) * SQ8_LEVELS) // span[p]) + 1) * span[p])
            // (2 * SQ8_LEVELS)
            for p in range(dim)
        ]
        for vid, v in ivec.items()
    }
    expected = {}
    for qid in range(N_QUERIES):
        dists = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(ivec[qid], recon[vid])),
                vid,
            )
            for vid in ivec
            if vid != qid
        )
        expected[qid] = [(vid, d) for d, vid in dists[:TOP_K]]

    rows = sq8_adc_topk(spark, SF_DIR).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rnk"])):
        got.setdefault(r["qid"], []).append((r["vec_id"], r["adc_dist"]))
    assert got == expected


def test_sq8_recall_beats_floor(spark):
    from harvester_spark.operators.similarity import sq8_recall_eval

    rows = sq8_recall_eval(spark, SF_DIR).collect()
    assert rows
    assert all(r["recall"] >= 0.6 for r in rows), rows


# ------------------------------------------------- terms agg shard error


def test_terms_shard_error_bound_is_honored(spark):
    from harvester_spark.operators.es_aggs import terms_shard_error_eval

    rows = terms_shard_error_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["merged_count"] <= r["exact_count"]
        assert 0 <= r["underestimate"] <= r["err_upper_bound"], r
    # non-degeneracy: the sharding must actually hide counts somewhere
    assert any(r["underestimate"] > 0 for r in rows)


# ------------------------------------------------------ recrawl schedule


def test_recrawl_lambda_and_interval_contract(spark):
    from harvester_spark.operators.graph import RECRAWL_CAP_S, recrawl_schedule

    rows = recrawl_schedule(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_changes"] <= r["n_visits"]
        assert (r["lam_micro"] == 0) == (r["n_changes"] == 0)
        assert 0 <= r["interval_s"] <= RECRAWL_CAP_S
        # spot-check the Cho estimator against pure Python
        lam = -math.log(
            (r["n_visits"] - r["n_changes"] + 0.5) / (r["n_visits"] + 0.5)
        )
        assert r["lam_micro"] == math.floor(lam * 1e6 + 0.5)
    intervals = {r["interval_s"] for r in rows}
    assert len(intervals) > 1  # the estimator discriminates


# ---------------------------------------------------- docID reorder gain


def test_docid_reorder_clustered_is_strictly_cheaper(spark):
    from harvester_spark.operators.index_stats import docid_reorder_gain

    rows = {r["assignment"]: r for r in docid_reorder_gain(spark, SF_DIR).collect()}
    assert set(rows) == {"hash", "termset"}
    assert rows["hash"]["n_postings"] == rows["termset"]["n_postings"]
    assert rows["termset"]["gap_bits"] < rows["hash"]["gap_bits"]


# --------------------------------------------------- URL path templates


def test_url_templates_aggregate(spark):
    from harvester_spark.operators.curation import url_path_templates
    from harvester_spark.operators.common import load

    rows = url_path_templates(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_urls"] for r in rows) == n_docs
    templates = {r["template"] for r in rows}
    assert templates == {
        "/p/{N}/review-{N}",
        "/blog/{N}/{N}/post-{N}",
        "/a/{N}",
    }
    # templates must aggregate, not mirror URLs 1:1
    assert any(r["n_urls"] > r["n_pages"] for r in rows)
    assert all(r["n_urls"] >= r["n_pages"] for r in rows)
    assert all(r["n_hosts"] >= 1 for r in rows)


# ------------------------------------------------------------------ LTR


def test_ltr_reorders_vs_bm25_and_is_monotone(spark):
    from harvester_spark.operators.ranking_ext import ltr_pointwise_topk

    rows = sorted(
        ltr_pointwise_topk(spark, SF_DIR).collect(), key=lambda r: r["rank"]
    )
    assert rows
    scores = [r["ltr_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    bm25 = [r["bm25_micro"] for r in rows]
    assert bm25 != sorted(bm25, reverse=True)  # the blend genuinely reorders


def test_ltr_tail_is_take_ordered(spark):
    from harvester_spark.operators.ranking_ext import ltr_pointwise_topk

    assert "TakeOrderedAndProject" in _plan(ltr_pointwise_topk(spark, SF_DIR))


# --------------------------------------------------- ranker agreement


def test_ranker_agreement_pair_accounting(spark):
    from harvester_spark.operators.ranking_ext import (
        AGREE_LEVELS,
        ranker_agreement_eval,
    )

    rows = {r["k"]: r for r in ranker_agreement_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(AGREE_LEVELS)
    for k, r in rows.items():
        assert 0 <= r["n_common"] <= 2 * k
        n = r["n_common"]
        assert r["conc"] + r["disc"] == n * (n - 1) // 2
        assert -1_000_000 <= r["tau_micro"] <= 1_000_000
    # the two families must actually disagree somewhere
    assert any(r["disc"] > 0 for r in rows.values())
