"""Common-grams builds: head∧head phrase via bigram tokens, rank identity.

The Lucene/ES common-grams model: a configured frequent-term list makes
adjacent listed-term pairs emit a bigram token at the first term's position
(index/build.py postings_rows). Phrase matching rewrites covered offsets to
one bigram constraint (search/phrase.py) — results must be IDENTICAL to a
plain positional build, and bigrams must never leak into scoring or
suggestion surfaces.
"""

import os

import numpy as np
import pytest

from harvester_spark.corpus import generate_corpus
from harvester_spark.index.build import IndexBuilder
from harvester_spark.pipeline import build_documents, run_build
from harvester_spark.search.api import SearchAPI
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.phrase import brute_force_phrase, positional_phrase_search

N_DOCS = 250
CG_TERMS = ["w00000", "w00001", "w00002", "term_7"]

PHRASES = [
    "w00000 w00001",            # head∧head: fully bigram-covered
    "w00000 w00001 w00002",     # chained bigrams
    "w00000 w09999",            # half-covered: bigram absent -> unigram path
    "term_7 w00000",            # covered pair, different df mix
    "w00001 block",             # mixed covered/uncovered offsets
]


@pytest.fixture(scope="module")
def envs(spark, tmp_root):
    plain_dir = os.path.join(tmp_root, "cg_plain")
    run_build(spark, plain_dir, n_docs=N_DOCS, resume=False, num_partitions=4)
    cg_dir = os.path.join(tmp_root, "cg_bigram")
    documents = build_documents(generate_corpus(spark, N_DOCS, 4), 4)
    documents.write.mode("overwrite").parquet(f"{cg_dir}/documents")
    documents = spark.read.parquet(f"{cg_dir}/documents")
    IndexBuilder(spark, f"{cg_dir}/index").build(
        documents, resume=False, num_partitions=4, common_gram_terms=CG_TERMS
    )
    docs_pdf = (
        spark.read.parquet(f"{plain_dir}/documents")
        .select("doc_id", "text", "lang")
        .toPandas()
    )
    return (
        IndexSearcher(spark, f"{plain_dir}/index"),
        IndexSearcher(spark, f"{cg_dir}/index"),
        docs_pdf,
        cg_dir,
    )


def test_marker_and_bigram_postings(envs):
    plain, cg, _docs, cg_dir = envs
    assert plain.common_grams() is None
    assert cg.common_grams() == frozenset(CG_TERMS)
    # bigram terms exist in the dictionary with positive df
    dfs = cg._dfs(["w00000 w00001"], "all")
    assert dfs["w00000 w00001"] > 0


@pytest.mark.parametrize("phrase", PHRASES)
@pytest.mark.parametrize("lang", ["all", "en", "nl"])
def test_phrase_identical_to_plain_build(envs, phrase, lang):
    plain, cg, docs_pdf, _ = envs
    a = positional_phrase_search(plain, phrase, k=10, lang=lang)
    b = positional_phrase_search(cg, phrase, k=10, lang=lang)
    assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), (phrase, lang)
    assert (
        np.asarray(a.topk["score"], np.float64)
        == np.asarray(b.topk["score"], np.float64)
    ).all(), (phrase, lang)
    assert a.results_total == b.results_total
    # and both equal the text oracle
    exp = brute_force_phrase(docs_pdf, phrase, k=10, lang=lang)
    assert list(b.topk["doc_id"]) == list(exp["doc_id"]), (phrase, lang)


def test_unigram_serving_unaffected(envs, spark):
    """BM25 AND/OR results on the common-grams index equal the plain build:
    bigram postings never enter unigram scoring (doc_len/df of query terms
    unchanged)."""
    from harvester_spark.search.wand import or_search

    plain, cg, _docs, _ = envs
    for q in ["w00000 w00001", "term_7", "w00002 block"]:
        a, b = plain.search(q, k=10), cg.search(q, k=10)
        assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), q
        assert (a.topk["score"].to_numpy() == b.topk["score"].to_numpy()).all()
        assert a.results_total == b.results_total
        ao, bo = or_search(plain, q, k=10), or_search(cg, q, k=10)
        assert list(ao["doc_id"]) == list(bo["doc_id"]), q


def test_bigrams_hidden_from_suggestions(envs, spark):
    _plain, cg, _docs, cg_dir = envs
    docs = spark.read.parquet(f"{cg_dir}/documents")
    api = SearchAPI(spark, f"{cg_dir}/index", docs)
    assert all(" " not in t for t in api.autocomplete("w000", 20))
    d = api._dictionary()
    assert not d["term"].str.contains(" ").any()


def test_randomized_repetition_battery(spark, tmp_root):
    """Adversarial adjacency fuzz: 60 docs over a 5-token alphabet (heavy
    repetition, overlapping occurrences, phrase==doc edge cases), 80 random
    phrases of length 1-4, plain AND common-grams builds both checked
    against the text oracle and each other."""
    import random

    import pandas as pd

    from harvester_spark.corpus import EPOCH, doc_url

    rng = random.Random(42)
    alpha = ["pa", "pb", "pc", "pd", "pe"]
    texts = []
    for i in range(60):
        n = rng.randint(1, 30)
        texts.append(" ".join(rng.choice(alpha) for _ in range(n)))
    pdf = pd.DataFrame(
        {
            "url": [doc_url(i) for i in range(60)],
            "warc_ts": [EPOCH + np.timedelta64(i, "s") for i in range(60)],
            "html": [f"<p>{t}</p>".encode() for t in texts],
            "text": texts,
            "lang": ["en"] * 60,
        }
    )
    corpus = spark.createDataFrame(pdf)
    out_p = os.path.join(tmp_root, "fuzz_plain")
    docs = build_documents(corpus, 4, verify_extraction=False)
    docs.write.mode("overwrite").parquet(f"{out_p}/documents")
    docs_r = spark.read.parquet(f"{out_p}/documents")
    IndexBuilder(spark, f"{out_p}/index").build(docs_r, resume=False, num_partitions=4)
    out_c = os.path.join(tmp_root, "fuzz_cg")
    IndexBuilder(spark, f"{out_c}/index").build(
        docs_r, resume=False, num_partitions=4, common_gram_terms=["pa", "pb", "pc"]
    )
    plain = IndexSearcher(spark, f"{out_p}/index")
    cg = IndexSearcher(spark, f"{out_c}/index")
    docs_pdf = docs_r.select("doc_id", "text", "lang").toPandas()

    for _ in range(80):
        phrase = " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 4)))
        exp = brute_force_phrase(docs_pdf, phrase, k=60)
        a = positional_phrase_search(plain, phrase, k=60)
        b = positional_phrase_search(cg, phrase, k=60)
        assert list(a.topk["doc_id"]) == list(exp["doc_id"]), phrase
        assert list(b.topk["doc_id"]) == list(exp["doc_id"]), phrase
        assert a.results_total == b.results_total, phrase
        assert (
            np.asarray(a.topk["score"], np.float64)
            == np.asarray(b.topk["score"], np.float64)
        ).all(), phrase


def test_batch_phrase_uses_bigram_constraints_on_cg_index(envs, spark):
    """phrase_search_batch over a common-grams index == the driver path on
    the same index (bigram constraints flow through the per-range kernel)."""
    from harvester_spark.search.distributed import phrase_search_batch

    _plain, cg, _docs, _ = envs
    qs = [(f"p{i}", ph, 0) for i, ph in enumerate(PHRASES)]
    got, totals = phrase_search_batch(spark, cg, qs, k=10, n_ranges=3)
    for qid, ph, _slop in qs:
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        exp = positional_phrase_search(cg, ph, k=10)
        assert list(sub["doc_id"]) == list(exp.topk["doc_id"]), ph
        assert (
            np.asarray(sub["score"], np.float64)
            == np.asarray(exp.topk["score"], np.float64)
        ).all(), ph
        assert totals[qid] == exp.results_total, ph


def test_derived_term_list_builds_identical_phrase_results(envs, spark, tmp_root):
    """select_common_gram_terms derives the build list from measured
    adjacency counts; a build using it must stay phrase-identical to the
    plain build and actually cover at least one frequent pair."""
    from harvester_spark.index.build import select_common_gram_terms

    plain, _cg, docs_pdf, cg_dir = envs
    documents = spark.read.parquet(f"{cg_dir}/documents")
    derived = select_common_gram_terms(documents, n_pairs=8)
    assert len(derived) >= 2
    out_dir = os.path.join(tmp_root, "cg_derived")
    IndexBuilder(spark, f"{out_dir}/index").build(
        documents, resume=False, num_partitions=4, common_gram_terms=derived
    )
    searcher = IndexSearcher(spark, f"{out_dir}/index")
    # the derived list must cover at least one adjacent pair in the corpus:
    # some bigram posting exists (bigram tokens contain a space)
    assert set(searcher.common_grams()) == set(derived)
    covered = [f"{a} {b}" for a in derived for b in derived]
    assert any(searcher._dfs([p], "all")[p] > 0 for p in covered)
    for ph in PHRASES:
        want = positional_phrase_search(plain, ph, k=10)
        got = positional_phrase_search(searcher, ph, k=10)
        assert want.topk["doc_id"].tolist() == got.topk["doc_id"].tolist()
        assert (
            np.asarray(want.topk["score"], np.float64)
            == np.asarray(got.topk["score"], np.float64)
        ).all()
        assert want.results_total == got.results_total
