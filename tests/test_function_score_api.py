"""function_score / boosting serving path: engine == brute-force oracle,
EXACT by the threshold-algorithm certificate.

Both transforms are multipliers m ∈ (0, 1] on BM25, so BM25 is a monotone
upper bound on the combined score: the engine may stop as soon as the
page-k-th combined score strictly beats the lowest fetched BM25. The
oracle scores EVERY matching document and applies the identical int64
micro arithmetic — rank identity on (doc_id, score_micro) is required,
including runs where the engine's first window was too small and the
doubling loop had to grow it.
"""

import math
import os

import numpy as np
import pytest

from harvester_spark.analysis import tokenize
from harvester_spark.pipeline import run_build
from harvester_spark.search.api import (
    FS_DL_OFFSET,
    FS_DL_ORIGIN,
    FS_DL_SCALE2,
    FS_UNIT,
    SearchAPI,
)
from harvester_spark.search.oracle import brute_force_topk, brute_force_topk_or

N_DOCS = 300


@pytest.fixture(scope="module")
def api(spark, tmp_root):
    out = os.path.join(tmp_root, "fscore_e2e")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    docs = spark.read.parquet(f"{out}/documents")
    return SearchAPI(spark, f"{out}/index", docs)


@pytest.fixture(scope="module")
def docs_pdf(api):
    return api.documents.select("doc_id", "text", "lang").toPandas()


def _mult_micro(doc_toks, gauss, neg_term):
    m = FS_UNIT
    if gauss:
        dl = float(len(doc_toks))
        dist = max(abs(dl - FS_DL_ORIGIN) - FS_DL_OFFSET, 0.0)
        m = int(
            math.floor(
                math.exp(-(dist * dist) * math.log(2.0) / FS_DL_SCALE2) * FS_UNIT
                + 0.5
            )
        )
    if neg_term is not None and neg_term in doc_toks:
        m = m // 2
    return m


def _expected(docs_pdf, query, or_mode, gauss, neg_term, k=10):
    base = (brute_force_topk_or if or_mode else brute_force_topk)(
        docs_pdf, query, k=N_DOCS
    )
    toks = {
        int(r["doc_id"]): tokenize(r["text"]) for _, r in docs_pdf.iterrows()
    }
    rows = []
    for _, r in base.iterrows():
        d = int(r["doc_id"])
        bm = int(math.floor(float(r["score"]) * FS_UNIT + 0.5))
        comb = (bm * _mult_micro(toks[d], gauss, neg_term)) // FS_UNIT
        rows.append((d, comb))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


@pytest.mark.parametrize("or_mode", [False, True])
def test_gauss_decay_matches_oracle(api, docs_pdf, or_mode):
    query = "w00000 w00001" if not or_mode else "w00000 w00003"
    out = api.search(
        query, k=10, operator="or" if or_mode else "and", gauss_decay=True
    )
    got = [(r["doc_id"], r["score_micro"]) for r in out["results"]]
    assert got == _expected(docs_pdf, query, or_mode, True, None)


def test_boosting_negative_matches_oracle(api, docs_pdf):
    query = "w00000 w00001"
    neg = "w00002"
    out = api.search(query, k=10, negative_term=neg)
    got = [(r["doc_id"], r["score_micro"]) for r in out["results"]]
    assert got == _expected(docs_pdf, query, False, False, neg)


def test_gauss_plus_negative_matches_oracle(api, docs_pdf):
    query = "w00000 w00001"
    neg = "w00002"
    out = api.search(query, k=10, gauss_decay=True, negative_term=neg)
    got = [(r["doc_id"], r["score_micro"]) for r in out["results"]]
    assert got == _expected(docs_pdf, query, False, True, neg)


def test_threshold_loop_grows_and_stays_exact(api, docs_pdf):
    """Force a too-small first window on a head-term query: the doubling
    loop must engage (fetch grows past the initial) and the result must
    still equal the score-everything oracle — the TA certificate at work."""
    query = "w00000"
    out = api._search_multiplier(
        query, 10, 1, "all", None, "and", True, None, (), False,
        initial_fetch=12,
    )
    got = [(r["doc_id"], r["score_micro"]) for r in out["results"]]
    assert got == _expected(docs_pdf, query, False, True, None)
    assert out["fs_fetch_used"] > 12
    assert out["fs_iterations"] >= 2


def test_rejects_incompatible_shapes(api):
    with pytest.raises(ValueError):
        api.search("w00000 -w00001", k=5, gauss_decay=True)
    with pytest.raises(ValueError):
        api.search("w00000", k=5, gauss_decay=True, recency_boost=True)
    with pytest.raises(ValueError):
        api.search(
            "w00000", k=5, negative_term="w00002",
            rescore_phrase="w00000 w00001",
        )


def test_decay_actually_reorders(api, docs_pdf):
    """Non-degeneracy: the gauss top-10 must differ from the plain BM25
    top-10 (a constant multiplier would prove nothing)."""
    query = "w00000 w00001"
    plain = api.search(query, k=10)
    dec = api.search(query, k=10, gauss_decay=True)
    assert [r["doc_id"] for r in plain["results"]] != [
        r["doc_id"] for r in dec["results"]
    ]
