"""Distributed (docID-range-partitioned) WAND == driver-side or_search."""

import os

import numpy as np
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.distributed import or_search_batch
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.wand import or_search

N_DOCS = 300


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    out = os.path.join(tmp_root, "dist")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    return spark, IndexSearcher(spark, f"{out}/index")


QUERIES = [
    ("q0", "w00000 w00100 w01000"),
    ("q1", "w00000 zzznohit"),
    ("q2", "w04999 w04988 term_7"),
    ("q3", "block max wand recovery"),
    ("q4", "w00001"),
    ("q5", "w00000 w00001 w00002 w00003 w00004"),
]


@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_batch_or_equals_driver_or(env, lang):
    spark, searcher = env
    got = or_search_batch(spark, searcher, QUERIES, k=10, lang=lang, n_ranges=5)
    for qid, qtext in QUERIES:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        exp = or_search(searcher, qtext, k=10, lang=lang)
        assert list(sub["doc_id"]) == list(exp["doc_id"]), (qid, lang)
        g = np.asarray(sub["score"], dtype=np.float64)
        e = np.asarray(exp["score"], dtype=np.float64)
        assert g.shape == e.shape and (g == e).all(), (qid, lang)


def test_batch_or_single_range_degenerate(env):
    """n_ranges=1 must also agree (whole space in one chunk)."""
    spark, searcher = env
    got = or_search_batch(spark, searcher, QUERIES[:2], k=5, n_ranges=1)
    for qid, qtext in QUERIES[:2]:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        exp = or_search(searcher, qtext, k=5)
        assert list(sub["doc_id"]) == list(exp["doc_id"]), qid


def test_batch_or_empty_and_dead(env):
    spark, searcher = env
    got = or_search_batch(
        spark, searcher, [("qq", "zzznohit qqqnope"), ("qe", "")], k=5
    )
    assert len(got) == 0


@pytest.mark.parametrize("lang", ["all", "en"])
def test_batch_and_equals_driver_search(env, lang):
    """Distributed conjunctive batch == driver IndexSearcher.search exactly,
    including exact totals summed from per-range candidate counts."""
    from harvester_spark.search.distributed import and_search_batch

    spark, searcher = env
    got, totals = and_search_batch(
        spark, searcher, QUERIES, k=10, lang=lang, n_ranges=5
    )
    for qid, qtext in QUERIES:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        exp = searcher.search(qtext, k=10, lang=lang)
        assert list(sub["doc_id"]) == list(exp.topk["doc_id"]), (qid, lang)
        g = np.asarray(sub["score"], dtype=np.float64)
        e = np.asarray(exp.topk["score"], dtype=np.float64)
        assert g.shape == e.shape and (g == e).all(), (qid, lang)
        assert totals[qid] == exp.results_total, (qid, lang)


def test_batch_and_single_range_and_dead(env):
    from harvester_spark.search.distributed import and_search_batch

    spark, searcher = env
    got, totals = and_search_batch(spark, searcher, QUERIES[:2], k=5, n_ranges=1)
    for qid, qtext in QUERIES[:2]:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        exp = searcher.search(qtext, k=5)
        assert list(sub["doc_id"]) == list(exp.topk["doc_id"]), qid
        assert totals[qid] == exp.results_total, qid
    got2, totals2 = and_search_batch(
        spark, searcher, [("qq", "zzznohit w00000"), ("qe", "")], k=5
    )
    assert len(got2) == 0 and totals2 == {"qq": 0, "qe": 0}


def test_batch_or_accumulate_strategy_identical(env):
    """Forcing the dense-accumulator branch in executors returns exactly the
    WAND-branch (and driver) ranking — the strategy changes where time goes,
    never what comes back."""
    spark, searcher = env
    acc = or_search_batch(spark, searcher, QUERIES, k=10, n_ranges=5,
                          strategy="accumulate")
    wnd = or_search_batch(spark, searcher, QUERIES, k=10, n_ranges=5,
                          strategy="wand")
    for qid, qtext in QUERIES:
        a = acc[acc["query_id"] == qid].reset_index(drop=True)
        w = wnd[wnd["query_id"] == qid].reset_index(drop=True)
        assert list(a["doc_id"]) == list(w["doc_id"]), qid
        assert (a["score"].to_numpy() == w["score"].to_numpy()).all(), qid
        drv = or_search(searcher, qtext, k=10)
        assert list(a["doc_id"]) == list(drv["doc_id"]), qid


PHRASES = [
    ("p0", "block max wand", 0),
    ("p1", "block max wand", 3),
    ("p2", "w00000 w00001", 0),
    ("p3", "w00000 w00001", 2),
    ("p4", "block zzznohit", 0),
    ("p5", "", 0),
    ("p6", "wand", 0),  # single-word phrase degrades to a term match
]


@pytest.mark.parametrize("n_ranges", [1, 5])
def test_batch_phrase_equals_driver_paths(env, n_ranges):
    """phrase_search_batch == positional_phrase_search (slop 0) and the SQS
    sloppy path (slop > 0) — docIDs, float64 scores, exact totals."""
    from harvester_spark.search.distributed import phrase_search_batch
    from harvester_spark.search.phrase import positional_phrase_search
    from harvester_spark.search.sqs import sqs_search

    spark, searcher = env
    got, totals = phrase_search_batch(
        spark, searcher, PHRASES, k=10, n_ranges=n_ranges
    )
    for qid, text, slop in PHRASES:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        if slop == 0 and text:
            exp = positional_phrase_search(searcher, text, k=10)
        else:
            exp = sqs_search(searcher, f'"{text}"~{slop}', k=10)
        assert list(sub["doc_id"]) == list(exp.topk["doc_id"]), (qid, n_ranges)
        g = np.asarray(sub["score"], dtype=np.float64)
        e = np.asarray(exp.topk["score"], dtype=np.float64)
        assert g.shape == e.shape and (g == e).all(), (qid, n_ranges)
        assert totals[qid] == exp.results_total, (qid, n_ranges)


def test_more_like_this_batch_equals_driver(env, tmp_root):
    """Batch MLT (one or_search_batch job for all seeds) == per-seed
    more_like_this exactly — docIDs AND float64 scores; missing and
    empty-text seeds drop out cleanly."""
    from harvester_spark.search.api import SearchAPI

    spark, _searcher = env
    out = os.path.join(tmp_root, "dist")
    docs = spark.read.parquet(f"{out}/documents")
    api = SearchAPI(spark, f"{out}/index", docs)
    seeds = [0, 7, 123, N_DOCS - 1]
    got = api.more_like_this_batch(seeds + [10**9], k=8, n_ranges=4)
    assert list(got.columns) == ["seed_doc_id", "rank", "doc_id", "score"]
    assert set(got["seed_doc_id"]) == set(seeds)  # missing seed dropped
    for s in seeds:
        sub = got[got["seed_doc_id"] == s].reset_index(drop=True)
        exp = api.more_like_this(s, k=8)
        assert list(sub["doc_id"]) == list(exp["doc_id"]), s
        assert list(sub["rank"]) == list(exp["rank"]), s
        g = np.asarray(sub["score"], dtype=np.float64)
        e = np.asarray(exp["score"], dtype=np.float64)
        assert (g == e).all(), s
    assert len(api.more_like_this_batch([10**9], k=5)) == 0


def test_phrase_match_ids_batch_equals_driver(env):
    """The distributed match-id path must return EXACTLY the driver ids for
    exact and sloppy phrases; the auto-dispatch (min-df cost model) must
    produce the same answer whichever side it picks."""
    from harvester_spark.search import phrase as ph
    from harvester_spark.search.distributed import phrase_match_ids_batch

    spark, searcher = env
    cases = [("w00000 w00001", 0), ("w00000 w00001", 2),
             ("block max wand", 0), ("w00000 w00002", 3),
             ("zzznohit w00000", 0), ("w00001", 0)]
    for text, slop in cases:
        want = ph.phrase_match_ids(searcher, text, slop=slop)
        got = phrase_match_ids_batch(spark, searcher, text, slop=slop, n_ranges=5)
        assert list(got) == list(want), (text, slop)

    # force the dispatch on (threshold 1): phrase_match_ids must route to
    # the batch path and still return identical ids
    old = ph.PHRASE_BATCH_MIN_DF
    ph.PHRASE_BATCH_MIN_DF = 1
    try:
        for text, slop in cases:
            direct = phrase_match_ids_batch(spark, searcher, text, slop=slop)
            via = ph.phrase_match_ids(searcher, text, slop=slop)
            assert list(via) == list(direct), (text, slop)
    finally:
        ph.PHRASE_BATCH_MIN_DF = old


# ----------------------------------- single-query dispatch (round-3)


def test_single_query_or_dispatch_rank_identity(env, monkeypatch):
    """or_search with the batch dispatch forced (threshold → 0) must return
    the exact driver ranking, with the exact total marked precise (every
    range runs the accumulator in the head-heavy regime)."""
    from harvester_spark.search import wand as wand_mod

    spark, searcher = env
    for qtext in ["w00000 w00001", "w00000 term_7", "block max wand"]:
        drv, dstats = wand_mod.or_search(
            searcher, qtext, k=10, with_stats=True, strategy="accumulate"
        )
        monkeypatch.setattr(wand_mod, "OR_BATCH_MIN_SUM_DF", 0)
        bat, bstats = wand_mod.or_search(searcher, qtext, k=10, with_stats=True)
        monkeypatch.setattr(wand_mod, "OR_BATCH_MIN_SUM_DF", 5_000_000)
        # Round-5 carve-out: a selective driver term forces MAXSCORE even
        # at batch-scale sum-df (wand._maxscore_carveout) — the dispatch
        # label follows it; rank identity is asserted either way.
        from harvester_spark.analysis import tokenize

        terms = sorted(set(tokenize(qtext)))
        dfs = searcher._dfs(terms, wand_mod.ALL_LANG)
        live = [t for t in terms if dfs[t] > 0]
        expected = (
            "maxscore"
            if wand_mod._maxscore_carveout(dfs, live)
            else "batch"
        )
        assert bstats["strategy"] == expected, qtext
        assert list(bat["doc_id"]) == list(drv["doc_id"]), qtext
        assert list(bat["score"]) == list(drv["score"]), qtext
        # totals: batch is exact when every range accumulated, a lower
        # bound when a range picked WAND; the maxscore carve-out's
        # survivor count is always a lower bound — same contract as the
        # driver strategies
        if bstats["strategy"] == "batch":
            if bstats["precise"]:
                assert bstats["scored"] == dstats["scored"], qtext
            else:
                assert 0 < bstats["scored"] <= dstats["scored"], qtext
        else:
            assert 0 < bstats["scored"] <= dstats["scored"], qtext


def test_single_query_and_dispatch_rank_identity(env, monkeypatch):
    """IndexSearcher.search with the batch dispatch forced must return the
    exact driver ranking AND the exact total, including paging."""
    from harvester_spark.search import phrase as phrase_mod

    spark, searcher = env
    for qtext in ["w00000 w00001", "block max", "w00000 w00001 w00002"]:
        drv = searcher.search(qtext, k=7)
        drv2 = searcher.search(qtext, k=3, page=2)
        monkeypatch.setattr(phrase_mod, "PHRASE_BATCH_MIN_DF", 0)
        bat = searcher.search(qtext, k=7)
        bat2 = searcher.search(qtext, k=3, page=2)
        monkeypatch.setattr(phrase_mod, "PHRASE_BATCH_MIN_DF", 200_000)
        assert list(bat.topk["doc_id"]) == list(drv.topk["doc_id"]), qtext
        assert list(bat.topk["score"]) == list(drv.topk["score"]), qtext
        assert bat.results_total == drv.results_total, qtext
        assert list(bat2.topk["doc_id"]) == list(drv2.topk["doc_id"]), qtext
        assert list(bat2.topk["rank"]) == list(drv2.topk["rank"]), qtext


def test_or_batch_with_totals_exact(env):
    """with_totals: per-range accumulator sums over disjoint ranges equal
    the driver accumulate's exact scored counts."""
    spark, searcher = env
    from harvester_spark.search.wand import or_search

    stacked, totals, precise = or_search_batch(
        spark, searcher, QUERIES, k=10, n_ranges=5,
        strategy="accumulate", with_totals=True,
    )
    for qid, qtext in QUERIES:
        _, dstats = or_search(
            searcher, qtext, k=10, with_stats=True, strategy="accumulate"
        )
        assert totals[qid] == dstats["scored"], (qid, qtext)
        assert precise[qid] is True
