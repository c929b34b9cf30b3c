"""Plan-shape guards for the session-8 operators (ranking_ext / es_aggs /
span corruption).

Same grading rule as test_scale_plans.py: correct-but-scale-killer ⇒ weak.
Pins:
- map-only ops really are zero-exchange (span_not, intervals, span
  corruption) — at 100 TB they must pipeline inside the scan stage;
- every new top-k compiles to TakeOrderedAndProject with the rank window
  AFTER the limit (never a global pre-limit row_number);
- the rescore phrase pass is bounded to the broadcast 50-doc window (a
  BroadcastHashJoin gates the token-array scan — no corpus-wide phrase
  job);
- adjacency_matrix is one aggregation, no joins;
- nothing introduces a cartesian / unbroadcast nested-loop product.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("opname", ["ft_span_not", "ft_intervals_ordered"])
def test_positional_array_ops_are_map_only(spark, opname):
    from harvester_spark.operators import ranking_ext

    df = getattr(ranking_ext, opname)(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan, opname
    assert "Join" not in plan, opname


def test_span_corruption_is_map_only(spark):
    from harvester_spark.operators import training_prep

    plan = _plan(training_prep.span_corruption_pairs(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Join" not in plan


@pytest.mark.parametrize(
    "opname",
    [
        "ft_common_terms_topk",
        "ft_rescore_topk",
        "ft_terms_set_match",
        "ft_rank_feature_topk",
        "ft_explain_score",
    ],
)
def test_ranking_ext_topk_is_take_ordered(spark, opname):
    from harvester_spark.operators import ranking_ext

    df = getattr(ranking_ext, opname)(spark, SF_DIR)
    assert df.count() > 0
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, opname
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), opname
    assert "CartesianProduct" not in plan, opname


def test_rescore_phrase_pass_is_window_bounded(spark):
    """The token-array scan feeding phrase_tf must be gated by the broadcast
    top-50 window — a missing broadcast would phrase-scan the corpus."""
    from harvester_spark.operators import ranking_ext

    df = ranking_ext.ft_rescore_topk(spark, SF_DIR)
    df.count()
    plan = _plan(df)
    # the 50-doc first-pass window materializes as a bounded TakeOrdered …
    assert f"limit={ranking_ext.RESCORE_WINDOW}" in plan
    # … and hash-broadcasts into the phrase join (the benign 1-row stats
    # cross-joins inside the shared OR kernel are BNLJ by design)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_adjacency_matrix_is_single_agg(spark):
    from harvester_spark.operators import es_aggs

    df = es_aggs.adjacency_matrix_terms(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    # partial agg map-side, one single-partition exchange for the final agg
    assert plan.count("Exchange") == 1


def test_composite_page_is_take_ordered(spark):
    from harvester_spark.operators import es_aggs

    df = es_aggs.composite_agg_page(spark, SF_DIR)
    df.count()
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pipeline_aggs_no_cartesian(spark):
    from harvester_spark.operators import es_aggs

    df = es_aggs.events_pipeline_aggs(spark, SF_DIR)
    df.count()
    plan = _plan(df)
    assert "CartesianProduct" not in plan


def test_span_first_shuffles_once_after_term_filter(spark):
    """The term filter must run below the per-doc agg: one hash exchange on
    doc_id over term-filtered rows only."""
    from harvester_spark.operators import ranking_ext

    df = ranking_ext.ft_span_first(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
