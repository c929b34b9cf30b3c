"""Retrieval-operator invariants beyond the oracle gate (retrieval.py)."""

from pyspark.sql import functions as F

from harvester_spark.operators.fulltext_queries import BM25_TERMS
from harvester_spark.operators.retrieval import (
    HN_N_QUERIES,
    HN_TOP_NEG,
    MLT_TOP_K,
    RM3_N_TERMS,
    ft_more_like_this,
    ft_rm3_expansion,
    hard_negative_mine,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rm3_excludes_query_terms_and_is_nondegenerate(spark):
    rows = ft_rm3_expansion(spark, SF_DIR).collect()
    assert len(rows) == RM3_N_TERMS
    terms = [r["term"] for r in rows]
    assert not set(terms) & set(BM25_TERMS)  # expansion only, never the query
    weights = [r["weight"] for r in rows]
    assert all(w > 0 for w in weights)
    assert weights == sorted(weights, reverse=True)
    assert len(set(weights)) > 1  # a real distribution, not a constant column


def test_hard_negatives_never_contain_the_positive(spark):
    rows = hard_negative_mine(spark, SF_DIR).collect()
    assert len(rows) == HN_N_QUERIES * HN_TOP_NEG
    assert all(r["neg_doc_id"] != r["q_id"] for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == HN_N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, HN_TOP_NEG + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)  # rank follows score


def test_hard_negatives_are_actually_hard(spark):
    """Negatives must outscore the corpus median candidate — i.e. the miner
    returns the TOP of the ranking, not arbitrary matches: every kept
    negative's score must be positive (a real term overlap)."""
    rows = hard_negative_mine(spark, SF_DIR).collect()
    assert all(r["score"] > 0 for r in rows)
    # at least one query has a genuinely competitive negative
    assert max(r["score"] for r in rows) > 1.0


def test_mlt_excludes_source_and_ranks_by_score(spark):
    out = ft_more_like_this(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == MLT_TOP_K
    src = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    assert all(r["doc_id"] != src for r in rows)
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) > 1


def test_mlt_top_doc_shares_vocabulary_with_source(spark):
    """The #1 MLT hit must share strictly more selected-term mass with the
    source than the #10 hit — similarity, not noise, drives the ranking."""
    rows = sorted(ft_more_like_this(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert rows[0]["score"] > rows[-1]["score"]


def test_percolate_registry_is_nondegenerate(spark):
    from harvester_spark.operators.retrieval import PERC_N_QUERIES, ft_percolate

    rows = ft_percolate(spark, SF_DIR).collect()
    assert len(rows) == PERC_N_QUERIES
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    counts = [r["n_matches"] for r in rows]
    assert all(0 <= c < n_docs for c in counts)  # AND is selective
    assert len(set(counts)) >= 3  # selectivities genuinely spread
    assert max(counts) > 0  # the registry actually fires
    assert all(r["term_a"] != r["term_b"] for r in rows)


def test_collapse_yields_distinct_sources_and_keeps_global_best(spark):
    from harvester_spark.operators.retrieval import COLLAPSE_K, ft_collapse_topk

    rows = sorted(ft_collapse_topk(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert len(rows) == COLLAPSE_K
    sources = [r["source"] for r in rows]
    assert len(set(sources)) == len(sources)  # collapse actually collapses
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the global #1 un-collapsed hit is by definition its source's best,
    # so it must survive collapsing and stay #1
    from harvester_spark.operators.fulltext_queries import ft_bm25_or_topk

    full = sorted(ft_bm25_or_topk(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert rows[0]["doc_id"] == full[0]["doc_id"]
    assert rows[0]["score"] == full[0]["score"]


def test_static_prune_binds_and_selects_exact_top_impacts(spark):
    """PRUNE_P must genuinely bind (df > P for every flagship term), each
    term keeps exactly P postings, and the kept set equals the brute-force
    top-P by (impact desc, doc_id asc) — no boundary leakage."""
    from collections import defaultdict

    from harvester_spark.operators.retrieval import PRUNE_P, ft_static_prune
    from harvester_spark.operators.fulltext_queries import BM25_TERMS, ft_postings

    kept = ft_static_prune(spark, SF_DIR).collect()
    by_term = defaultdict(list)
    for r in kept:
        by_term[r["term"]].append(r)
    assert set(by_term) == set(BM25_TERMS)
    assert all(len(v) == PRUNE_P for v in by_term.values())
    # df really exceeds P at this sf
    df = {
        r["term"]: r["c"]
        for r in ft_postings(spark, SF_DIR).groupBy("term").count()
        .withColumnRenamed("count", "c").collect()
    }
    assert all(df[t] > PRUNE_P for t in BM25_TERMS), df
    for t, rows in by_term.items():
        impacts = sorted(((r["impact"], r["doc_id"]) for r in rows))
        assert len({r["doc_id"] for r in rows}) == PRUNE_P
        assert min(r["impact"] for r in rows) > 0


def test_min_pair_distance_matches_bruteforce(spark):
    """Merged-order lag trick == quadratic brute force over occurrence
    lists, for every doc containing both probe terms."""
    from harvester_spark.analysis import tokenize
    from harvester_spark.operators.retrieval import (
        PROX_A,
        PROX_B,
        ft_min_pair_distance,
    )

    got = {
        r["doc_id"]: (r["n_a"], r["n_b"], r["min_dist"])
        for r in ft_min_pair_distance(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {}
    for d in docs:
        toks = tokenize(d["text"])
        pa = [i for i, t in enumerate(toks) if t == PROX_A]
        pb = [i for i, t in enumerate(toks) if t == PROX_B]
        if pa and pb:
            md = min(abs(a - b) for a in pa for b in pb)
            expected[d["doc_id"]] = (len(pa), len(pb), md)
    assert got == expected
    assert len(expected) > 10  # a real co-occurrence set
    assert min(v[2] for v in expected.values()) >= 1


def test_ann_lsh_recall_is_a_real_eval(spark):
    """Recall per query is in (0, 1]; the multi-probe LSH path must find at
    least one true neighbor for most queries (mean recall > 0.5 on this
    corpus — pinned from the oracle values) without being trivially 1.0."""
    from harvester_spark.operators.similarity import N_QUERIES, ann_lsh_recall

    rows = ann_lsh_recall(spark, SF_DIR).collect()
    assert len(rows) == N_QUERIES
    recs = [r["recall"] for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recs)
    assert sum(recs) / len(recs) > 0.5
    assert min(recs) < 1.0  # approximate, not secretly exact


def test_mmr_diversity_actually_binds(spark):
    """MMR must (a) open with the pure-relevance argmax, (b) pick K
    distinct docs, and (c) DIVERGE from the relevance-only top-K order —
    if the similarity penalty never changes a pick, the operator proves
    nothing about diversification."""
    from pyspark.sql import functions as F

    from harvester_spark.operators.fulltext_queries import bm25_or_scored
    from harvester_spark.operators.retrieval import MMR_K, ft_mmr_topk

    sf = "/root/testdata/sf0.01"
    picks = sorted(
        ft_mmr_topk(spark, sf).collect(), key=lambda r: r["pick"]
    )
    assert [r["pick"] for r in picks] == list(range(1, MMR_K + 1))
    ids = [r["doc_id"] for r in picks]
    assert len(set(ids)) == MMR_K
    rel = [
        r["doc_id"]
        for r in bm25_or_scored(spark, sf)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(MMR_K)
        .collect()
    ]
    assert ids[0] == rel[0]  # first pick is pure relevance
    assert ids != rel  # the penalty reorders the tail
    assert picks[0]["maxsim_micro"] == 0
    assert all(r["obj"] == 7 * r["rel_micro"] - 3 * r["maxsim_micro"] for r in picks[1:])


def test_rank_eval_ndcg_phrase_grades_actually_discriminate(spark):
    """nDCG must be < 1 with real spread: the phrase-aware grades exist
    because a term-overlap grade saturates to 1.0 on this corpus and the
    eval would prove nothing (the degenerate-synthesis trap)."""
    from harvester_spark.operators.retrieval import HN_N_QUERIES, ft_rank_eval_ndcg

    rows = ft_rank_eval_ndcg(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == HN_N_QUERIES
    nd = [r["ndcg"] for r in rows]
    assert all(0.0 < v <= 1.0 for v in nd)
    assert max(nd) < 1.0  # BM25 never exactly recovers the phrase order
    assert len(set(nd)) > HN_N_QUERIES // 3  # per-query spread
    assert all(r["dcg_micro"] <= r["idcg_micro"] for r in rows)


def test_rank_eval_prk_spreads_and_handles_zero_hit_queries(spark):
    """Precision@10/MRR must vary across queries (rel==3 relevance — the
    rel>=2 version saturates at 1.0 and proves nothing) and zero-hit
    queries must report 0, not vanish from the output."""
    from harvester_spark.operators.retrieval import HN_N_QUERIES, ft_rank_eval_prk

    rows = ft_rank_eval_prk(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == HN_N_QUERIES
    ps = [r["prec_at10"] for r in rows]
    assert len(set(ps)) > 3 and max(ps) < 1.0
    zero = [r for r in rows if r["n_rel_at10"] == 0]
    assert zero and all(r["rr_micro"] == 0 and r["prec_at10"] == 0.0 for r in zero)
    hit = [r for r in rows if r["n_rel_at10"] > 0]
    assert hit and all(0 < r["rr_micro"] <= 10**6 for r in hit)
