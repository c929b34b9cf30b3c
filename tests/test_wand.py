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
