"""Plan-shape guards for session-10 operators.

What each guard pins (and why a regression matters at 100 TB):
- anchor_text_topk's per-host top-K must compile to WindowGroupLimit —
  the partial top-K runs on BOTH sides of the dst exchange, so the
  shuffle carries <= K rows per (host, partition) instead of every
  (host, anchor) count.
- es_rare_terms must cut with TakeOrderedAndProject (never a global
  sort) and keep its doc_count threshold BELOW the agg, so the cut input
  is the rare tail, not the vocabulary.
- the codec/roaring/zipf planning tables must stay one-windowed
  aggregation pipelines — a second exchange on the postings key means
  someone broke the shared-scaffold reuse.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_anchor_text_uses_window_group_limit(spark):
    from harvester_spark.operators.graph import anchor_text_topk

    df = anchor_text_topk(spark, SF_DIR)
    assert df.count() > 0
    assert "WindowGroupLimit" in _plan(df)


def test_rare_terms_is_take_ordered_with_pre_agg_filter(spark):
    from harvester_spark.operators.es_aggs import (
        RARE_MAX_DOC_COUNT,
        es_rare_terms,
    )

    df = es_rare_terms(spark, SF_DIR)
    rows = df.collect()
    assert rows and all(r["doc_count"] <= RARE_MAX_DOC_COUNT for r in rows)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # threshold applied before the ordered cut (a Filter feeds the take)
    assert "Filter" in plan


@pytest.mark.parametrize(
    "opname", ["postings_codec_compare", "postings_roaring_size", "ft_zipf_slope"]
)
def test_planning_tables_have_single_postings_exchange_family(spark, opname):
    """The planning tables share the SPIMI stats plan: window + grouped
    aggs over ONE logical postings keying. Guard the exchange count stays
    small (<= 3: distinct/window partials + the final agg) — a jump means
    an accidental re-shuffle of the token stream."""
    from harvester_spark.operators import index_stats

    df = getattr(index_stats, opname)(spark, SF_DIR)
    assert df.count() > 0
    plan = _plan(df)
    assert plan.count("Exchange") <= 4, (opname, plan.count("Exchange"))
