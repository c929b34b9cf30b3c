"""ES-rescore serving path: engine == brute-force oracle, window-bounded.

The SearchAPI ``rescore_phrase`` option must reproduce, exactly, the
reference computation: first-pass ranking (engine AND / OR — both already
rank-identical to the brute-force oracle), exact-adjacency phrase counts on
the top-``window`` docs only, combined = orig + weight * phrase_tf, docs
below the window keep their original score, global re-sort
(score desc, doc_id asc).
"""

import os

import numpy as np
import pytest

from harvester_spark.analysis import tokenize
from harvester_spark.pipeline import run_build
from harvester_spark.search.api import SearchAPI
from harvester_spark.search.oracle import brute_force_topk, brute_force_topk_or

N_DOCS = 300
WINDOW = 50
WEIGHT = 0.5


@pytest.fixture(scope="module")
def api(spark, tmp_root):
    out = os.path.join(tmp_root, "rescore_e2e")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    docs = spark.read.parquet(f"{out}/documents")
    return SearchAPI(spark, f"{out}/index", docs)


@pytest.fixture(scope="module")
def docs_pdf(api):
    return (
        api.documents.select("doc_id", "text", "lang").toPandas()
    )


def _expected(docs_pdf, query, phrase, or_mode, k=10):
    base = (brute_force_topk_or if or_mode else brute_force_topk)(
        docs_pdf, query, k=N_DOCS
    )
    toks = {
        int(r["doc_id"]): tokenize(r["text"])
        for _, r in docs_pdf.iterrows()
    }
    ph = tokenize(phrase)

    def tf(doc_id):
        ts = toks[doc_id]
        return sum(
            1
            for i in range(len(ts) - len(ph) + 1)
            if ts[i : i + len(ph)] == ph
        )

    rows = []
    for i, r in base.reset_index(drop=True).iterrows():
        s = float(r["score"])
        if i < WINDOW:
            s += WEIGHT * tf(int(r["doc_id"]))
        rows.append((int(r["doc_id"]), s))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


def _phrase_in_window(docs_pdf, query, or_mode):
    """A bigram guaranteed to hit inside the rescore window: the first two
    tokens of the query's own brute-force top-1 document."""
    base = (brute_force_topk_or if or_mode else brute_force_topk)(
        docs_pdf, query, k=1
    )
    top_id = int(base["doc_id"].iloc[0])
    ts = tokenize(
        docs_pdf[docs_pdf["doc_id"] == top_id]["text"].iloc[0]
    )
    return f"{ts[0]} {ts[1]}"


@pytest.mark.parametrize("or_mode", [False, True])
def test_rescore_matches_oracle(api, docs_pdf, or_mode):
    query = "w00000 w00001" if not or_mode else "w00000 w00003"
    phrase = _phrase_in_window(docs_pdf, query, or_mode)
    out = api.search(
        query,
        k=10,
        operator="or" if or_mode else "and",
        rescore_phrase=phrase,
        rescore_window=WINDOW,
        rescore_weight=WEIGHT,
    )
    got = [(r["doc_id"], r["score"]) for r in out["results"]]
    want = _expected(docs_pdf, query, phrase, or_mode)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want], atol=1e-9)
    # non-degenerate: the phrase bonus actually moved at least one score
    assert any(r["score"] != r["orig_score"] for r in out["results"])


def test_phrase_tf_counts_exact(api, docs_pdf):
    from harvester_spark.search.phrase import phrase_tf_for_docs

    phrase = _phrase_in_window(docs_pdf, "w00000", False)
    ph = tokenize(phrase)
    ids = docs_pdf["doc_id"].to_numpy(dtype=np.int64)[:80]
    got = phrase_tf_for_docs(api.searcher, phrase, ids)
    for _, r in docs_pdf[docs_pdf["doc_id"].isin(ids)].iterrows():
        ts = tokenize(r["text"])
        want = sum(
            1
            for i in range(len(ts) - len(ph) + 1)
            if ts[i : i + len(ph)] == ph
        )
        assert got.get(int(r["doc_id"]), 0) == want


def test_rescore_rejects_incompatible_shapes(api):
    with pytest.raises(ValueError):
        api.search("w00000 -w00001", rescore_phrase="w00000 w00001")
    with pytest.raises(ValueError):
        api.search(
            "w00000", rescore_phrase="w00000 w00001", recency_boost=True
        )


def test_rescore_zero_hit_phrase_keeps_base_ranking(api, docs_pdf):
    out = api.search(
        "w00000", k=10, rescore_phrase="w00000 qqqzzzmissing",
    )
    base = brute_force_topk(docs_pdf, "w00000", k=10)
    assert [r["doc_id"] for r in out["results"]] == list(base["doc_id"])
    assert all(r["score"] == r["orig_score"] for r in out["results"])
