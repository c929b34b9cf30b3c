"""Highlighting: window-ranker unit semantics, API e2e on all three query
paths, and cross-implementation parity with the oracle-gated Spark operator
(ft_snippet_topk) — two independent implementations of one window contract.
"""

from __future__ import annotations

import os

import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.api import SearchAPI
from harvester_spark.search.highlight import (
    SNIP_W,
    best_window,
    extract_positive_terms,
    highlight_text,
    render_snippet,
)


class TestWindowRanker:
    def test_distinct_terms_beat_hit_count(self):
        toks = "key key key xx yy zz ww vv uu tt key value".split()
        # anchor 0: {key}x3 hits; anchor 10: {key,value} → 2 distinct wins
        start, n_terms, n_hits = best_window(toks, {"key", "value", "table"})
        assert (start, n_terms, n_hits) == (10, 2, 2)

    def test_tie_breaks_earliest(self):
        toks = "key value aa bb cc dd ee ff gg hh key value".split()
        start, n_terms, n_hits = best_window(toks, {"key", "value"})
        assert (start, n_terms, n_hits) == (0, 2, 2)

    def test_no_hits_is_none(self):
        assert best_window("aa bb cc".split(), {"key"}) is None

    def test_prefix_hits(self):
        toks = "alpha keyboard beta".split()
        start, n_terms, n_hits = best_window(toks, set(), ["key"])
        assert (start, n_terms, n_hits) == (1, 1, 1)

    def test_render_wraps_hits(self):
        toks = "aa key value bb".split()
        assert (
            render_snippet(toks, 0, {"key", "value"})
            == "aa <em>key</em> <em>value</em> bb"
        )


class TestTermExtraction:
    def test_negated_terms_excluded(self):
        terms, prefixes = extract_positive_terms("key -secret value")
        assert terms == {"key", "value"} and prefixes == []

    def test_phrase_words_included(self):
        terms, _ = extract_positive_terms('"merge sort" table')
        assert terms == {"merge", "sort", "table"}

    def test_prefix_and_fuzzy(self):
        terms, prefixes = extract_positive_terms("data* valeu~1 key")
        assert terms == {"key"} and prefixes == ["data"]

    def test_or_and_parens(self):
        terms, _ = extract_positive_terms("(key | value) table")
        assert terms == {"key", "value", "table"}

    def test_highlight_text_none_without_terms(self):
        assert highlight_text("some text here", "-only -negated") is None


N_DOCS = 200


@pytest.fixture(scope="module")
def api(spark, tmp_root):
    out = os.path.join(tmp_root, "hl_api")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    documents = spark.read.parquet(f"{out}/documents")
    return SearchAPI(spark, f"{out}/index", documents), documents


class TestApiHighlight:
    def _texts(self, documents):
        return {
            r.doc_id: r.text
            for r in documents.select("doc_id", "text").collect()
        }

    def test_and_path(self, api):
        api_, documents = api
        res = api_.search("w00000 w00001", k=5, highlight=True)
        assert res["results"], "query must match"
        texts = self._texts(documents)
        for r in res["results"]:
            assert "<em>" in r["highlight"]
            # every snippet is a real contiguous window of the doc
            plain = r["highlight"].replace("<em>", "").replace("</em>", "")
            from harvester_spark.analysis import tokenize

            assert plain in " ".join(tokenize(texts[r["doc_id"]]))

    def test_or_path(self, api):
        api_, _ = api
        res = api_.search("w00000 w00001", k=5, operator="or", highlight=True)
        assert res["results"]
        assert all("<em>" in r["highlight"] for r in res["results"])

    def test_sqs_path_negation_not_highlighted(self, api):
        api_, _ = api
        res = api_.search("w00000 -w00001", k=5, highlight=True)
        assert res["results"]
        for r in res["results"]:
            assert "<em>w00000</em>" in r["highlight"]
            assert "<em>w00001</em>" not in r["highlight"]

    def test_highlight_off_by_default(self, api):
        api_, _ = api
        res = api_.search("w00000", k=3)
        assert all("highlight" not in r for r in res["results"])

    def test_best_window_maximizes_distinct_terms(self, api):
        # the chosen fragment must contain as many distinct query terms as
        # ANY window of the doc (the operator's optimality property)
        from harvester_spark.analysis import tokenize

        api_, documents = api
        res = api_.search("w00000 w00001", k=5, highlight=True)
        texts = self._texts(documents)
        for r in res["results"]:
            toks = tokenize(texts[r["doc_id"]])
            got_distinct = r["highlight"].count("<em>")
            win = best_window(toks, {"w00000", "w00001"})
            assert got_distinct >= 1
            # brute-force optimum over ALL windows (not just hit-anchored)
            best = 0
            for s in range(len(toks)):
                w = set(toks[s : s + SNIP_W]) & {"w00000", "w00001"}
                best = max(best, len(w))
            assert win[1] == best


class TestOperatorParity:
    def test_driver_ranker_equals_spark_operator(self, spark, tmp_root):
        """Two independent implementations, one contract: the Python window
        ranker (serving path) must pick the identical (start, n_terms,
        n_hits) as the oracle-gated Spark operator on the same corpus."""
        from harvester_spark.analysis import tokenize
        from harvester_spark.operators.text_analytics import BM25_TERMS, ft_snippet_topk

        sf = "/root/testdata/sf0.001"
        rows = ft_snippet_topk(spark, sf).collect()
        assert len(rows) == 10
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
        }
        for r in rows:
            win = best_window(tokenize(docs[r.doc_id]), set(BM25_TERMS))
            assert win == (r.snip_start, r.n_terms, r.n_hits), r.doc_id
            snip = render_snippet(
                tokenize(docs[r.doc_id]), win[0], set(BM25_TERMS)
            ).replace("<em>", "").replace("</em>", "")
            assert snip == r.snippet
