"""ft_significant_terms must actually discriminate: the synthesized topic
terms must out-rank every organic corpus term, and the score must beat the
deterministic background noise (bg-noise docs carry the same tokens). A
degenerate score (constant, or df-ordered) fails these pins."""

SF_DIR = "/root/testdata/sf0.001"


def test_significant_terms_discriminate(spark):
    from harvester_spark.operators.fulltext_queries import (
        SIG_TOPICS,
        ft_significant_terms,
    )
    from harvester_spark.operators.common import load

    rows = ft_significant_terms(spark, SF_DIR).collect()
    assert len(rows) > len(SIG_TOPICS)

    # the three topic terms hold exactly the top ranks
    assert {r["term"] for r in rows[: len(SIG_TOPICS)]} == set(SIG_TOPICS)

    docs = load(spark, SF_DIR, "documents")
    n_bg = docs.count()
    n_fg = docs.filter(docs.doc_id % 5 == 0).count()
    base_rate = n_fg / n_bg

    for r in rows[: len(SIG_TOPICS)]:
        # genuinely over-represented, but NOT noiseless: the bg-noise docs
        # mean fg_df < df, so the score had to separate signal from noise
        assert r["fg_df"] < r["df"]
        assert r["fg_df"] / r["df"] >= 2 * base_rate
        assert r["jlh_micro"] > 0

    # organic terms score far below the topical ones
    organic = [r for r in rows if r["term"] not in SIG_TOPICS]
    if organic:
        assert max(r["jlh_micro"] for r in organic) < min(
            r["jlh_micro"] for r in rows[: len(SIG_TOPICS)]
        )

    # ranking is (score desc, term asc)
    keys = [(-r["jlh_micro"], r["term"]) for r in rows]
    assert keys == sorted(keys)
