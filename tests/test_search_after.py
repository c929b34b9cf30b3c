"""ES `search_after` deep-pagination cursor: walking pages via cursors must
reproduce the deep ranking EXACTLY (doc_ids and float64 scores), on the
driver path, the distributed dispatch path, and the filtered API path."""

import os

import numpy as np
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.api import Filters, SearchAPI
from harvester_spark.search.engine import IndexSearcher

N_DOCS = 200
QUERY = "w00000 w00001"  # head terms: many matches, scores collide often


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    out = os.path.join(tmp_root, "search_after")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    return out


def _walk(searcher, query, page_size, n_pages, **kw):
    """Cursor-walk n_pages of page_size, concatenating results."""
    ids, scores, cursor = [], [], None
    for _ in range(n_pages):
        res = searcher.search(query, k=page_size, search_after=cursor, **kw)
        got = res.topk
        if not len(got):
            break
        ids += [int(d) for d in got["doc_id"]]
        scores += [float(s) for s in got["score"]]
        cursor = (scores[-1], ids[-1])
    return ids, scores, res.results_total


def test_search_after_walk_equals_deep_ranking(spark, built):
    searcher = IndexSearcher(spark, f"{built}/index")
    deep = searcher.search(QUERY, k=40).topk
    assert len(deep) == 40, "query must match deeply enough to test"
    ids, scores, total = _walk(searcher, QUERY, page_size=8, n_pages=5)
    assert ids == [int(d) for d in deep["doc_id"]]
    assert scores == [float(s) for s in deep["score"]]  # exact float equality
    # totals are cursor-independent (ES contract)
    assert total == searcher.search(QUERY, k=1).results_total

    # resume from an arbitrary mid-ranking row: the cursor row itself is
    # excluded by the tie arm (score ==, doc_id >), the rest follow exactly
    mid = 17
    res = searcher.search(
        QUERY, k=10, search_after=(float(scores[mid]), ids[mid])
    ).topk
    assert [int(d) for d in res["doc_id"]] == ids[mid + 1 : mid + 11]
    assert [float(s) for s in res["score"]] == scores[mid + 1 : mid + 11]


def test_search_after_exhausts_cleanly(spark, built):
    searcher = IndexSearcher(spark, f"{built}/index")
    total = searcher.search(QUERY, k=1).results_total
    ids, _, _ = _walk(searcher, QUERY, page_size=50, n_pages=total // 50 + 2)
    assert len(ids) == total  # every match served exactly once
    assert len(set(ids)) == total


def test_search_after_dispatch_parity(spark, built, monkeypatch):
    """Forcing the distributed docID-range dispatch must not change a single
    cursor page."""
    import harvester_spark.search.phrase as phrase_mod

    searcher = IndexSearcher(spark, f"{built}/index")
    driver_ids, driver_scores, driver_total = _walk(
        searcher, QUERY, page_size=7, n_pages=3
    )
    monkeypatch.setattr(phrase_mod, "PHRASE_BATCH_MIN_DF", 0)
    disp_ids, disp_scores, disp_total = _walk(
        searcher, QUERY, page_size=7, n_pages=3
    )
    assert disp_ids == driver_ids
    assert disp_scores == driver_scores
    assert disp_total == driver_total


def test_search_after_page_mutually_exclusive(spark, built):
    searcher = IndexSearcher(spark, f"{built}/index")
    with pytest.raises(ValueError):
        searcher.search(QUERY, k=5, page=2, search_after=(1.0, 3))


def test_api_search_after_with_filters(spark, built):
    docs = spark.read.parquet(f"{built}/documents")
    api = SearchAPI(spark, f"{built}/index", docs)
    flt = Filters(fields={"set_name": ["alpha", "bravo"]})
    base = api.search(QUERY, k=30, filters=flt)
    want = [(r["doc_id"], r["score"]) for r in base["results"]]
    got, cursor = [], None
    while len(got) < len(want):
        res = api.search(QUERY, k=6, filters=flt, search_after=cursor)
        rows = res["results"]
        if not rows:
            break
        got += [(r["doc_id"], r["score"]) for r in rows]
        cursor = (rows[-1]["score"], rows[-1]["doc_id"])
        assert res["results_total"] == base["results_total"]
    assert got == want

    for bad in (
        dict(operator="or"),
        dict(recency_boost=True),
        dict(page=2),
    ):
        with pytest.raises(ValueError):
            api.search(QUERY, k=5, search_after=(1.0, 3), **bad)
