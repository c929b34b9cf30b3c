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


# ------------------------- positional-postings path (no document fetch) ----

from harvester_spark.search.phrase import phrase_match_ids, positional_phrase_search


@pytest.mark.parametrize("phrase", list(PHRASES) + ["max wand block"])
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_positional_phrase_rank_identity(env, phrase, lang):
    searcher, documents, docs_pdf = env
    assert searcher.has_positions
    got = positional_phrase_search(searcher, phrase, k=10, lang=lang).topk
    exp = brute_force_phrase(docs_pdf, phrase, k=10, lang=lang)
    assert list(got["doc_id"]) == list(exp["doc_id"]), (phrase, lang)
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), (phrase, lang)


def test_positional_matches_text_verify_path(env):
    """Positions path and the legacy candidate-AND+verify path agree on the
    full match set (totals), and the positional path needs no documents."""
    searcher, documents, docs_pdf = env
    for phrase in list(PHRASES)[:3]:
        pos_ids = set(phrase_match_ids(searcher, phrase).tolist())
        legacy = phrase_search(searcher, documents, phrase, k=10**6)
        assert pos_ids == set(
            docs_pdf[
                docs_pdf["text"].map(
                    lambda t: _contains_phrase(
                        __import__("harvester_spark.analysis", fromlist=["tokenize"]).tokenize(t or ""),
                        __import__("harvester_spark.analysis", fromlist=["tokenize"]).tokenize(phrase),
                    )
                )
            ]["doc_id"].tolist()
        )
        assert legacy.results_total == len(pos_ids)


def test_positional_phrase_repeated_term(env):
    """Phrases with a repeated term exercise the position-set chain."""
    searcher, documents, docs_pdf = env
    for q in ["wand wand", "block block max"]:
        got = positional_phrase_search(searcher, q, k=10).topk
        exp = brute_force_phrase(docs_pdf, q, k=10)
        assert list(got["doc_id"]) == list(exp["doc_id"]), q


# ------------------------------------------------------------- phrase slop


from harvester_spark.analysis import tokenize as _tok
from harvester_spark.search.sqs import _sloppy_contains


def _brute_slop_ids(docs_pdf, words, slop):
    return sorted(
        int(r.doc_id)
        for r in docs_pdf.itertuples(index=False)
        if _sloppy_contains(_tok(r.text or ""), words, slop)
    )


def test_sloppy_phrase_semantics(env):
    """phrase_match_ids(slop=N) == the independent ordered-proximity oracle;
    matches grow monotonically with slop; slop=0 equals the exact path."""
    searcher, _documents, docs_pdf = env
    for q in ["w00000 w00001", "table hash", "wand wand", "block block max"]:
        words = q.split()
        prev: set | None = None
        for slop in [1, 2, 5]:
            got = sorted(phrase_match_ids(searcher, q, slop=slop).tolist())
            assert got == _brute_slop_ids(docs_pdf, words, slop), (q, slop)
            if prev is not None:
                assert prev <= set(got), (q, slop)
            prev = set(got)
        exact = sorted(phrase_match_ids(searcher, q).tolist())
        assert exact == _brute_slop_ids(docs_pdf, words, 0), q


def test_sloppy_phrase_fuzz(env):
    """Random phrases × random slops over the built corpus vs the oracle."""
    import random

    searcher, _documents, docs_pdf = env
    rng = random.Random(7)
    vocab = ["table", "hash", "w00000", "w00001", "term_7", "wand", "block", "max"]
    for _ in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 3))]
        slop = rng.randint(1, 4)
        got = sorted(
            phrase_match_ids(searcher, " ".join(words), slop=slop).tolist()
        )
        assert got == _brute_slop_ids(docs_pdf, words, slop), (words, slop)
