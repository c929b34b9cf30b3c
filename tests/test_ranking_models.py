"""Semantics + plan guards for the ranking-models family (JM, PL2, SDM).

What each test pins:
- All three top-k surfaces return exactly 10 rows with unique ranks 1..10
  and a strictly enforced (score desc, doc_id asc) total order — the
  repo-wide tie-break contract.
- SDM feature non-degeneracy: every feature class (T/O/U) must actually
  fire on the corpus — an ordered-bigram leg with cf = 0 would silently
  reduce SDM to the unigram LM and the oracle would still "pass".
  Additionally U-window counts dominate O-adjacency counts per pair
  (|Δpos| < 8 strictly contains Δpos = +1), which pins the window join's
  direction and bounds.
- SDM must genuinely reorder vs the pure unigram Dirichlet ranking —
  otherwise the proximity legs are dead weight (the ltr_pointwise_topk
  discipline).
- Plan guards: the JM/SDM all-docs scoring spine must stay broadcast
  (no shuffle-side CartesianProduct; condition-free BroadcastNestedLoop
  Cross joins over the ≤7-row dims are the expected shape — see
  CLAUDE.md session-9 note), and PL2's candidate spine must contain a
  term filter BEFORE the tf aggregation (pushdown — candidates come from
  postings, never an all-docs scan followed by a filter).
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _check_topk(df, score_col):
    rows = df.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    ordered = sorted(
        rows, key=lambda r: (-r[score_col], r["doc_id"])
    )
    assert [r["doc_id"] for r in ordered] == [r["doc_id"] for r in rows]
    assert len({r["doc_id"] for r in rows}) == 10
    return rows


def test_jm_topk_contract(spark):
    from harvester_spark.operators.ranking_models import ft_lm_jm_topk

    _check_topk(ft_lm_jm_topk(spark, SF_DIR), "logp_micro")


def test_pl2_topk_contract(spark):
    from harvester_spark.operators.ranking_models import ft_dfr_pl2_topk

    _check_topk(ft_dfr_pl2_topk(spark, SF_DIR), "score_micro")


def test_sdm_topk_contract_and_reorders_vs_unigram(spark):
    from harvester_spark.operators.fulltext_queries import ft_lm_dirichlet_topk
    from harvester_spark.operators.ranking_models import ft_sdm_topk

    rows = _check_topk(ft_sdm_topk(spark, SF_DIR), "score_cm")
    uni = ft_lm_dirichlet_topk(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in rows] != [r["doc_id"] for r in uni], (
        "SDM ranking identical to the unigram LM — proximity legs dead"
    )


def test_sdm_features_nondegenerate(spark):
    """Every T/O/U feature must have cf >= 1, and U >= O per bigram."""
    from pyspark.sql import functions as F

    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.common import doc_tokens
    from harvester_spark.operators.ranking_models import SDM_PAIRS, SDM_WINDOW

    qpos = (
        doc_tokens(spark, SF_DIR)
        .filter(F.col("term").isin(BM25_TERMS))
        .select("doc_id", "term", "pos")
        .cache()
    )
    try:
        for ta, tb in SDM_PAIRS:
            x = qpos.filter(F.col("term") == ta).select(
                "doc_id", F.col("pos").alias("pa")
            )
            y = qpos.filter(F.col("term") == tb).select(
                "doc_id", F.col("pos").alias("pb")
            )
            j = x.join(y, "doc_id")
            o_cf = j.filter(F.col("pb") == F.col("pa") + 1).count()
            u_cf = j.filter(
                F.abs(F.col("pa") - F.col("pb")) < SDM_WINDOW
            ).count()
            assert o_cf >= 1, f"ordered bigram ({ta},{tb}) never occurs"
            assert u_cf >= o_cf, "window-8 must contain adjacency"
    finally:
        qpos.unpersist()


def test_jm_sdm_plans_stay_broadcast(spark):
    from harvester_spark.operators.ranking_models import (
        ft_lm_jm_topk,
        ft_sdm_topk,
    )

    for fn in (ft_lm_jm_topk, ft_sdm_topk):
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan  # the tiny-dim spine


def test_pl2_term_filter_pushed_before_tf_agg(spark):
    from harvester_spark.operators.ranking_models import ft_dfr_pl2_topk

    plan = _plan(ft_dfr_pl2_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # the candidate tf agg must be fed by a term IN (...) filter
    assert "key" in plan and "value" in plan and "table" in plan


def test_dfi_topk_contract_and_gate_fires_both_ways(spark):
    """DFI top-k contract + the independence gate must be NON-degenerate.

    The clamp `tf·tdl <= cf·dl → 0` must actually zero out some matching
    (term, doc) cells on this corpus AND let others through — if every
    cell passed (gate dead) DFI collapses to a plain chi² sum and the
    oracle would still agree; if every cell were clamped the scores would
    be all-zero and rank would be decided purely by the doc_id tie-break.
    """
    from pyspark.sql import functions as F

    from harvester_spark.operators.common import doc_tokens
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.ranking_models import ft_dfi_topk

    rows = _check_topk(ft_dfi_topk(spark, SF_DIR), "score_micro")
    assert rows[0]["score_micro"] > 0, "all DFI scores zero — gate ate everything"

    toks = doc_tokens(spark, SF_DIR)
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    tdl = toks.count()
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    cells = tf.join(F.broadcast(cf), "term").join(dl, "doc_id")
    gated = cells.filter(
        F.col("tf") * F.lit(tdl) <= F.col("cf") * F.col("dl")
    ).count()
    passed = cells.filter(
        F.col("tf") * F.lit(tdl) > F.col("cf") * F.col("dl")
    ).count()
    assert gated >= 1, "independence gate never fires — clamp is dead code"
    assert passed >= 1, "independence gate clamps every cell"


def test_ib_ll_topk_contract_and_family_distinct(spark):
    """IB-LL top-k contract + the zoo must not collapse: IB's DF-lambda
    weighting must produce a different doc ordering than PL2 (same tfn,
    different information model) and than DFI (different gate) on this
    corpus — measured distinct at sf0.001, pinned so a refactor that
    accidentally rewires IB onto another family's gain string fails."""
    from harvester_spark.operators.ranking_models import (
        ft_dfi_topk,
        ft_dfr_pl2_topk,
        ft_ib_ll_topk,
    )

    rows = _check_topk(ft_ib_ll_topk(spark, SF_DIR), "score_micro")
    assert rows[0]["score_micro"] > 0
    ib = [r["doc_id"] for r in rows]
    pl2 = [r["doc_id"] for r in ft_dfr_pl2_topk(spark, SF_DIR).collect()]
    dfi = [r["doc_id"] for r in ft_dfi_topk(spark, SF_DIR).collect()]
    assert ib != pl2, "IB ranking identical to PL2 — DF-lambda leg dead"
    assert ib != dfi, "IB ranking identical to DFI"


def test_dfi_plan_broadcast_spine(spark):
    from harvester_spark.operators.ranking_models import ft_dfi_topk

    plan = _plan(ft_dfi_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # cf + tdl dims ride broadcast joins; the 1-row tdl crossJoin compiles
    # to a condition-free BroadcastNestedLoopJoin Cross (CLAUDE.md session-9)
    assert "BroadcastNestedLoopJoin" in plan


def test_sign_test_exact_binomial_and_nondegenerate(spark):
    """The sign test's p-value recomputed exactly via math.comb from the
    reported win/loss counts (the operator's own tail sum must be the
    true binomial tail), plus the partition law wa+wb+ties == nq and the
    non-degeneracy the comparison needs: the two rankers genuinely
    disagree on most queries (measured ne = 15 of 16 at sf0.001 — a
    near-all-ties table would make the test vacuous)."""
    import math

    from harvester_spark.operators.ranking_ext import ranker_sign_test

    rows = ranker_sign_test(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_queries"] == 16
    assert (
        r["wins_bm25"] + r["wins_dirichlet"] + r["ties"] == r["n_queries"]
    )
    ne = r["wins_bm25"] + r["wins_dirichlet"]
    assert ne >= 8, "rankers tie almost everywhere — sign test vacuous"
    m = min(r["wins_bm25"], r["wins_dirichlet"])
    s = sum(math.comb(ne, k) for k in range(m + 1))
    assert r["sign_s_tail"] == s
    assert r["sign_p_micro"] == min(10**6, (2 * s * 10**6) // (1 << ne))
    # both directions must occur: a ranker that dominates 16/16 on this
    # corpus would mean the Dirichlet leg degenerated (e.g. all tf=0)
    assert r["wins_bm25"] >= 1 and r["wins_dirichlet"] >= 1
