"""Vectorized conjunctive block-max fast path: exact top-k rank identity."""

import os

import numpy as np
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.conjunctive import and_search_fast
from harvester_spark.search.engine import IndexSearcher

N_DOCS = 400


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    out = os.path.join(tmp_root, "conj")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    return IndexSearcher(spark, f"{out}/index")


QUERIES = [
    "w00000 w00001",            # head ∧ head
    "w00000 w00001 w00002",     # 3-term head AND
    "w00000 w01000",            # head ∧ rare
    "term_7 w00000",
    "w00001",                   # single term
    "w00000 zzznohit",          # dead term → empty
    "block max wand",
]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_fast_and_rank_identity(env, query, lang):
    searcher = env
    exact = searcher.search(query, k=10, lang=lang)
    fast = and_search_fast(searcher, query, k=10, lang=lang)
    assert list(fast.topk["doc_id"]) == list(exact.topk["doc_id"]), (query, lang)
    g = np.asarray(fast.topk["score"], dtype=np.float64)
    e = np.asarray(exact.topk["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), (query, lang)
    assert fast.is_precise is False
    assert fast.results_total <= exact.results_total  # scored ≤ matches


@pytest.mark.parametrize("batch", [7, 64, 100000])
def test_fast_and_small_batches_force_skipping(env, batch):
    """Tiny batches exercise the bound-skip and incremental θ paths."""
    searcher = env
    for query in ["w00000 w00001", "w00000 w00001 w00002"]:
        exact = searcher.search(query, k=5)
        fast = and_search_fast(searcher, query, k=5, batch=batch)
        assert list(fast.topk["doc_id"]) == list(exact.topk["doc_id"]), (query, batch)
        assert (
            np.asarray(fast.topk["score"], np.float64)
            == np.asarray(exact.topk["score"], np.float64)
        ).all(), (query, batch)


def test_fast_and_actually_skips(env):
    """With a tiny batch size and small k, at least one batch must be
    skipped on a head∧head query (scored < full intersection size)."""
    searcher = env
    exact = searcher.search("w00000 w00001", k=1)
    fast = and_search_fast(searcher, "w00000 w00001", k=1, batch=16)
    assert fast.results_total < exact.results_total


def test_fast_path_via_api(spark, tmp_root, env):
    from harvester_spark.search.api import SearchAPI

    out = os.path.join(tmp_root, "conj")
    docs = spark.read.parquet(f"{out}/documents")
    api = SearchAPI(spark, f"{out}/index", docs)
    fast = api.search("w00000 w00001", k=5, precise_total=False)
    exact = api.search("w00000 w00001", k=5)
    assert [r["doc_id"] for r in fast["results"]] == [
        r["doc_id"] for r in exact["results"]
    ]
    assert fast["results_total"]["is_precise"] is False
    assert exact["results_total"]["is_precise"] is True
