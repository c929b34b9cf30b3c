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


# ---------------------------------------------- out-of-order slop (round-3)


def _brute_assignment_slop(ts, words, slop):
    """Third, genuinely independent checker: enumerate ALL per-slot position
    assignments (itertools.product), require distinct positions, accept if
    the shifted span max(p_i - i) - min(p_i - i) <= slop."""
    import itertools

    pos = {w: [i for i, t in enumerate(ts) if t == w] for w in set(words)}
    if any(not p for p in pos.values()):
        return False
    for combo in itertools.product(*[pos[w] for w in words]):
        if len(set(combo)) != len(combo):
            continue
        shifted = [p - i for i, p in enumerate(combo)]
        if max(shifted) - min(shifted) <= slop:
            return True
    return False


def test_sloppy_transposition_semantics():
    """Lucene out-of-order slop: "a b"~2 matches "b a"; ~1 does not; the
    scalar oracle agrees with the assignment-enumerating brute force on
    hand-picked boundary cases including repeated words."""
    cases = [
        ("b a".split(), ["a", "b"], 1, False),
        ("b a".split(), ["a", "b"], 2, True),
        ("a x b".split(), ["a", "b"], 1, True),
        ("b x a".split(), ["a", "b"], 2, False),   # displacement 3
        ("b x a".split(), ["a", "b"], 3, True),
        ("c a b".split(), ["a", "b", "c"], 1, False),
        ("c a b".split(), ["a", "b", "c"], 3, True),  # c moved 2, span 3
        # repeated words need DISTINCT positions
        ("a b".split(), ["a", "a"], 4, False),
        ("a x a".split(), ["a", "a"], 1, True),
        ("a a".split(), ["a", "a"], 0, True),
        ("a b a".split(), ["a", "b", "a"], 0, True),   # the exact phrase
        ("a b x a".split(), ["a", "b", "a"], 0, False),
        ("a b x a".split(), ["a", "b", "a"], 1, True),
    ]
    for ts, words, slop, want in cases:
        assert _sloppy_contains(ts, words, slop) is want, (ts, words, slop)
        assert _brute_assignment_slop(ts, words, slop) is want, (ts, words, slop)


def test_sloppy_oracle_matches_brute_fuzz():
    """Randomized triangulation: scalar oracle == assignment brute force on
    thousands of tiny texts (incl. repeated query words)."""
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    for _ in range(3000):
        ts = [rng.choice(vocab) for _ in range(rng.randint(1, 9))]
        m = rng.randint(2, 3)
        words = [rng.choice(vocab) for _ in range(m)]
        slop = rng.randint(0, 4)
        got = _sloppy_contains(ts, words, slop)
        want = _brute_assignment_slop(ts, words, slop)
        assert got == want, (ts, words, slop, got, want)


def test_sloppy_engine_transpositions(env):
    """Engine path (chain_slop_keys over the real index) == oracle on
    transposed-order phrases across slops."""
    searcher, _documents, docs_pdf = env
    for q in ["w00001 w00000", "hash table", "max block", "wand wand"]:
        words = q.split()
        for slop in [0, 1, 2, 3, 5]:
            got = sorted(phrase_match_ids(searcher, q, slop=slop).tolist())
            assert got == _brute_slop_ids(docs_pdf, words, slop), (q, slop)
