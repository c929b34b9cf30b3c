"""Block-max WAND: rank identity with the brute-force OR oracle + pruning."""

import os

import numpy as np
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.oracle import brute_force_topk_or
from harvester_spark.search.wand import or_search, wand_topk

N_DOCS = 300


@pytest.fixture(scope="module")
def wand_env(spark, tmp_root):
    out = os.path.join(tmp_root, "wand")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    searcher = IndexSearcher(spark, f"{out}/index")
    docs_pdf = (
        spark.read.parquet(f"{out}/documents")
        .select("doc_id", "text", "lang")
        .toPandas()
    )
    return searcher, docs_pdf


OR_QUERIES = [
    "w00000 w00100 w01000",
    "w00000 zzznohit",            # dead term ignored in OR
    "w04999 w04988 term_7",
    "block max wand recovery",    # mix of planted + missing
    "w00001",
    "w00000 w00001 w00002 w00003 w00004",
]


@pytest.mark.parametrize("query", OR_QUERIES)
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_wand_rank_identical_to_or_oracle(wand_env, query, lang):
    searcher, docs_pdf = wand_env
    got = or_search(searcher, query, k=10, lang=lang)
    exp = brute_force_topk_or(docs_pdf, query, k=10, lang=lang)
    assert list(got["doc_id"]) == list(exp["doc_id"]), (query, lang)
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), (query, lang)


def test_wand_prunes_blocks(wand_env):
    """With a selective k, WAND must score fewer docs than the full union."""
    searcher, docs_pdf = wand_env
    from harvester_spark.analysis import tokenize
    from pyspark.sql import functions as F

    terms = ["w00000", "w01000"]  # head term + rare term
    dfs = searcher._dfs(terms, "all")
    blocks = searcher._term_postings(terms, "all")
    term_blocks = {t: blocks[blocks["term"] == t] for t in terms}
    n_docs, avgdl = searcher._corpus_stats["all"]
    topk, stats = wand_topk(
        term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k=3, impact_col="impact_all"
    )
    union_size = dfs["w00000"] + dfs["w01000"]
    assert len(topk) == 3
    assert stats["scored"] <= union_size  # sanity
    # rank identity on this pair too
    exp = brute_force_topk_or(docs_pdf, "w00000 w01000", k=3)
    assert list(topk["doc_id"]) == list(exp["doc_id"])


@pytest.mark.parametrize("query", ["w00000 w00100", "w00001 w00002 w00003", "term_7 w00000"])
def test_wand_require_all_matches_and_oracle(wand_env, query):
    """Conjunctive WAND (imprecise totals, exact top-k) == AND oracle top-k."""
    from harvester_spark.analysis import tokenize
    from harvester_spark.search.oracle import brute_force_topk

    searcher, docs_pdf = wand_env
    terms = sorted(set(tokenize(query)))
    dfs = searcher._dfs(terms, "all")
    blocks = searcher._term_postings(terms, "all")
    term_blocks = {t: blocks[blocks["term"] == t] for t in terms}
    n_docs, avgdl = searcher._corpus_stats["all"]
    topk, _ = wand_topk(
        term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k=10,
        impact_col="impact_all", require_all=True,
    )
    exp = brute_force_topk(docs_pdf, query, k=10)
    assert list(topk["doc_id"]) == list(exp["doc_id"]), query
    assert (
        np.asarray(topk["score"], dtype=np.float64)
        == np.asarray(exp["score"], dtype=np.float64)
    ).all(), query


# ---------------------------------------------------------------------------
# Adversarial synthetic-block cases: the per-round advisor's repro — a
# high-impact posting hiding in a LATER block behind a low-impact full block.
# Current-block bounds must never drive pivot selection / termination.
# ---------------------------------------------------------------------------

import pandas as pd

from harvester_spark.index.codec import encode_blocks
from harvester_spark.search import bm25


def _mk_blocks(doc_ids, tfs, doc_lens, avgdl, block_size=128):
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    imp = bm25.tf_norm(tf, doc_lens[ids], avgdl)
    rows = []
    for s in range(0, len(ids), block_size):
        (base, _n, deltas, tfb, _mtf, mimp) = encode_blocks(
            ids[s : s + block_size], tf[s : s + block_size], imp[s : s + block_size]
        )[0]
        rows.append(
            {
                "base_doc_id": base,
                "max_doc_id": int(ids[s : s + block_size][-1]),
                "doc_deltas": deltas,
                "tfs": tfb,
                "impact_all": mimp,
                "impact_lang": mimp,
            }
        )
    return pd.DataFrame(rows)


def _brute(postings, dfs, n_docs, avgdl, doc_lens, k):
    """Exact scorer over explicit postings {term: (ids, tfs)}."""
    scores: dict[int, float] = {}
    for t in bm25.term_order(list(postings), dfs):
        w = float(bm25.idf(n_docs, dfs[t]))
        for d, tf in zip(*postings[t]):
            scores[int(d)] = scores.get(int(d), 0.0) + w * float(
                bm25.tf_norm(np.float64(tf), np.float64(doc_lens[int(d)]), avgdl)
            )
    items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [d for d, _ in items], [s for _, s in items]


def test_wand_skewed_block_boundary():
    """advisor repro: term y's block 1 is 128 low-impact postings; the block
    AFTER it holds a short-doc high-tf posting that beats θ. Termination /
    pivoting on current-block bounds would return doc 0; list-level bounds
    must find doc 500."""
    n_docs = 1000
    doc_lens = np.full(n_docs, 100.0)
    doc_lens[401:529] = 4000.0  # long docs → tiny impact in y's first block
    doc_lens[900] = 10.0        # short doc → huge impact in y's second block
    avgdl = float(doc_lens.mean())

    # head term x (docs 0..399, df=400 → modest idf) is fully consumed first
    # and sets θ ≈ 1.4. Then only y remains, its CURRENT block's UB ≈ 0.6
    # < θ — but its SECOND block holds doc 900 with true score ≈ 4.3 > θ.
    # Terminating (or skipping) on the current block's bound drops doc 900.
    x_ids = np.arange(0, 400)
    x_tfs = np.ones(400, np.int64)
    y_ids = np.concatenate([np.arange(401, 529), [900]])
    y_tfs = np.concatenate([np.ones(128, np.int64), [8]])

    postings = {"x": (x_ids, x_tfs), "y": (y_ids, y_tfs)}
    dfs = {"x": 400, "y": 129}
    term_blocks = {
        "x": _mk_blocks(x_ids, x_tfs, doc_lens, avgdl),
        "y": _mk_blocks(y_ids, y_tfs, doc_lens, avgdl),
    }
    assert len(term_blocks["y"]) == 2  # the trap needs a block boundary

    for k in (1, 2, 5):
        got, _ = wand_topk(term_blocks, dfs, n_docs, avgdl, doc_lens, k=k)
        exp_ids, exp_scores = _brute(postings, dfs, n_docs, avgdl, doc_lens, k)
        assert list(got["doc_id"]) == exp_ids, k
        assert np.array_equal(np.asarray(got["score"], np.float64), np.asarray(exp_scores)), k


def test_wand_fuzz_multiblock_skew():
    """Randomized multi-term multi-block lists with skewed doc lengths:
    wand_topk must stay rank- and score-identical to the explicit scorer."""
    rng = np.random.default_rng(7)
    n_docs = 5000
    doc_lens = rng.choice([8.0, 60.0, 400.0, 2500.0], size=n_docs, p=[0.05, 0.6, 0.3, 0.05])
    avgdl = float(doc_lens.mean())
    for trial in range(8):
        postings, dfs, term_blocks = {}, {}, {}
        for ti in range(rng.integers(2, 5)):
            t = f"t{ti}"
            n = int(rng.integers(5, 700))
            ids = np.sort(rng.choice(n_docs, size=n, replace=False)).astype(np.int64)
            tfs = rng.integers(1, 9, size=n).astype(np.int64)
            postings[t] = (ids, tfs)
            dfs[t] = n
            term_blocks[t] = _mk_blocks(ids, tfs, doc_lens, avgdl)
        for k in (1, 3, 10):
            got, _ = wand_topk(term_blocks, dfs, n_docs, avgdl, doc_lens, k=k)
            exp_ids, exp_scores = _brute(postings, dfs, n_docs, avgdl, doc_lens, k)
            assert list(got["doc_id"]) == exp_ids, (trial, k)
            assert np.array_equal(
                np.asarray(got["score"], np.float64), np.asarray(exp_scores)
            ), (trial, k)


# ---------------------------------------------------------------------------
# Vectorized dense-accumulator OR path: bit-identical to WAND and the oracle,
# plus the cost-model dispatch.
# ---------------------------------------------------------------------------

from harvester_spark.search.wand import _pick_or_strategy, or_accumulate_topk


@pytest.mark.parametrize("query", OR_QUERIES)
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_accumulate_rank_identical(wand_env, query, lang):
    searcher, docs_pdf = wand_env
    got = or_search(searcher, query, k=10, lang=lang, strategy="accumulate")
    exp = brute_force_topk_or(docs_pdf, query, k=10, lang=lang)
    assert list(got["doc_id"]) == list(exp["doc_id"]), (query, lang)
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), (query, lang)
    # and bit-identical to the WAND strategy
    w = or_search(searcher, query, k=10, lang=lang, strategy="wand")
    assert list(got["doc_id"]) == list(w["doc_id"])
    assert (np.asarray(got["score"]) == np.asarray(w["score"])).all()


def test_accumulate_exact_total_and_allowed(wand_env):
    searcher, docs_pdf = wand_env
    from harvester_spark.search.oracle import brute_force_topk_or

    topk, stats = or_search(
        searcher, "w00000 w00001", k=5, strategy="accumulate", with_stats=True
    )
    # exact match count: equals the candidate union of the brute oracle
    exp_all = brute_force_topk_or(docs_pdf, "w00000 w00001", k=10**9)
    assert stats["scored"] == len(exp_all)
    # allowed filter restricts both candidates and the exact total
    allowed = np.asarray(exp_all["doc_id"], dtype=np.int64)[::2]
    topk_f, stats_f = or_search(
        searcher, "w00000 w00001", k=5, strategy="accumulate",
        allowed_doc_ids=allowed, with_stats=True,
    )
    assert stats_f["scored"] == allowed.size
    assert set(topk_f["doc_id"]).issubset(set(allowed.tolist()))


def test_or_strategy_dispatch():
    # head-heavy: no rare term to bound the pivot -> accumulate
    assert _pick_or_strategy({"a": 600_000, "b": 500_000, "c": 700_000},
                             ["a", "b", "c"]) == "accumulate"
    # classic WAND win: rare term drives theta, head lists get skipped
    assert _pick_or_strategy({"rare": 40, "head": 600_000},
                             ["rare", "head"]) == "wand"
    # round-4 3-way routing: mid+head mix (selective driver, big decode
    # volume) -> maxscore; the mid list is too big for the Python cursor
    # walk but selective enough (min <= 0.1*max) to flip heads to probe mode
    assert _pick_or_strategy(
        {"mid": 100_000, "h1": 1_300_000, "h2": 1_300_000},
        ["mid", "h1", "h2"]) == "maxscore"
    # same shape but below the volume floor -> accumulate finishes in ms
    assert _pick_or_strategy(
        {"mid": 4_000, "h1": 60_000, "h2": 60_000},
        ["mid", "h1", "h2"]) == "accumulate"
    # selective-ratio boundary: min_df just above 0.1*max stays accumulate
    assert _pick_or_strategy(
        {"mid": 140_000, "h1": 1_300_000}, ["mid", "h1"]) == "accumulate"


@pytest.mark.parametrize("query", OR_QUERIES)
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_maxscore_rank_identical(wand_env, query, lang):
    """MaxScore strategy: bit-identical docIDs AND scores vs the oracle and
    the other two strategies on the full query battery."""
    searcher, docs_pdf = wand_env
    got = or_search(searcher, query, k=10, lang=lang, strategy="maxscore")
    exp = brute_force_topk_or(docs_pdf, query, k=10, lang=lang)
    assert list(got["doc_id"]) == list(exp["doc_id"]), (query, lang)
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), (query, lang)
    acc = or_search(searcher, query, k=10, lang=lang, strategy="accumulate")
    assert list(got["doc_id"]) == list(acc["doc_id"])
    assert (np.asarray(got["score"]) == np.asarray(acc["score"])).all()


def test_maxscore_fuzz_rank_identity(wand_env):
    """Adversarial battery: random term mixes (rare+head), small k, every
    query checked bit-identical against the accumulator."""
    import random

    searcher, docs_pdf = wand_env
    vocab = ["w00000", "w00001", "w00002", "w00100", "w01000", "w04999",
             "term_7", "block", "max"]
    rng = random.Random(42)
    for trial in range(40):
        q = " ".join(rng.sample(vocab, rng.randint(1, 5)))
        k = rng.choice([1, 2, 3, 10])
        got = or_search(searcher, q, k=k, strategy="maxscore")
        exp = or_search(searcher, q, k=k, strategy="accumulate")
        assert list(got["doc_id"]) == list(exp["doc_id"]), (trial, q, k)
        assert (
            np.asarray(got["score"], dtype=np.float64)
            == np.asarray(exp["score"], dtype=np.float64)
        ).all(), (trial, q, k)


def test_maxscore_allowed_filter_and_probe_skip(wand_env):
    """Allowed-filtered MaxScore stays rank-identical to the filtered
    accumulator, and on a rare+head mix the probe-only phase must actually
    SKIP head-term blocks (the decode saving WAND can't get vectorized)."""
    searcher, docs_pdf = wand_env
    from harvester_spark.search.oracle import brute_force_topk_or
    from harvester_spark.search.wand import or_maxscore_topk

    exp_all = brute_force_topk_or(docs_pdf, "w00000 w00001", k=10**9)
    allowed = np.asarray(exp_all["doc_id"], dtype=np.int64)[::2]
    got = or_search(searcher, "w00000 w00001", k=5, strategy="maxscore",
                    allowed_doc_ids=allowed)
    exp = or_search(searcher, "w00000 w00001", k=5, strategy="accumulate",
                    allowed_doc_ids=allowed)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert (np.asarray(got["score"]) == np.asarray(exp["score"])).all()

    # probe-skip evidence: k=1 with a dominant rare term makes every
    # candidate-free head block skippable
    terms = ["w01000", "w00000"]
    dfs = searcher._dfs(terms, "all")
    blocks = searcher._term_postings(terms, "all")
    term_blocks = {t: blocks[blocks["term"] == t] for t in terms}
    n_docs, avgdl = searcher._corpus_stats["all"]
    topk, stats = or_maxscore_topk(
        term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k=1,
        impact_col="impact_all",
    )
    exp1 = brute_force_topk_or(docs_pdf, "w01000 w00000", k=1)
    assert list(topk["doc_id"]) == list(exp1["doc_id"])
    assert stats["blocks_decoded"] + stats["blocks_skipped"] > 0


def test_maxscore_edges_empty_allowed_and_large_k(wand_env):
    searcher, docs_pdf = wand_env
    # allowed set excludes every match -> clean empty frame
    got = or_search(searcher, "w00000 w00001", k=5, strategy="maxscore",
                    allowed_doc_ids=np.asarray([10**9], dtype=np.int64))
    assert len(got) == 0
    # k far beyond the match count -> all matches, still rank-identical
    got = or_search(searcher, "w01000", k=10**6, strategy="maxscore")
    exp = or_search(searcher, "w01000", k=10**6, strategy="accumulate")
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert (np.asarray(got["score"]) == np.asarray(exp["score"])).all()
    # dead-term-only query
    got = or_search(searcher, "zzznohit", k=5, strategy="maxscore")
    assert len(got) == 0
