"""Phrase search: adjacency required, rank-identical to the phrase oracle."""

import os

import numpy as np
import pytest

from harvester_spark.corpus import PHRASES
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.phrase import _contains_phrase, brute_force_phrase, phrase_search


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    out = os.path.join(tmp_root, "phrase")
    run_build(spark, out, n_docs=300, resume=False, num_partitions=8)
    documents = spark.read.parquet(f"{out}/documents")
    searcher = IndexSearcher(spark, f"{out}/index")
    docs_pdf = documents.select("doc_id", "text", "lang").toPandas()
    return searcher, documents, docs_pdf


def test_contains_phrase():
    toks = "a b c d b c".split()
    assert _contains_phrase(toks, ["b", "c"])
    assert _contains_phrase(toks, ["c", "d", "b"])
    assert not _contains_phrase(toks, ["b", "d"])
    assert not _contains_phrase(toks, ["c", "e"])
    assert not _contains_phrase([], ["a"])


@pytest.mark.parametrize("phrase", list(PHRASES) + ["max wand block"])
def test_phrase_rank_identity(env, phrase):
    searcher, documents, docs_pdf = env
    got = phrase_search(searcher, documents, phrase, k=10).topk
    exp = brute_force_phrase(docs_pdf, phrase, k=10)
    assert list(got["doc_id"]) == list(exp["doc_id"]), phrase
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), phrase


def test_phrase_stricter_than_and(env):
    """Scrambled word order must match fewer (or equal) docs than AND."""
    searcher, documents, docs_pdf = env
    phrase = "block max wand"
    and_hits = searcher.search(phrase, k=10**6).results_total
    ph = phrase_search(searcher, documents, phrase, k=10**6)
    scrambled = phrase_search(searcher, documents, "wand block max", k=10**6)
    assert ph.results_total <= and_hits
    assert ph.results_total > 0  # planted phrase exists in order
    assert scrambled.results_total <= ph.results_total  # scrambled ≈ absent
