"""Semantics tests for the text-analytics operators (snippets, keywords,
PMI) and the exact stratified quota sampler.

The oracle-parity gate proves Spark==DuckDB on the corpus; these tests pin
the semantics on crafted corpora where the right answer is known by hand,
and guard the non-degeneracy of the corpus-level signals (an oracle can
pass on a constant column and prove nothing).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators import text_analytics as ta
from harvester_spark.operators import training_prep as tp

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


def _mini_corpus(spark, tmp_root, name, rows):
    """Write a crafted documents.parquet; rows = [(doc_id, text, lang)]."""
    d = os.path.join(tmp_root, name)
    spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


class TestSnippets:
    def test_adjacent_terms_win_and_text_matches(self, spark, tmp_root):
        # doc 0: the three flagship terms adjacent at pos 2 — best window
        # must anchor there with all 3 distinct terms; doc 1 carries the
        # terms far apart, so its best window holds fewer distinct terms.
        rows = [
            (0, "aa bb key value table cc dd ee ff gg", "en"),
            (1, "key aa bb cc dd ee ff gg hh ii jj kk value aa bb cc dd ee "
                "ff gg hh ii jj kk table", "en"),
        ]
        sf = _mini_corpus(spark, tmp_root, "snip1", rows)
        out = {r.doc_id: r for r in ta.ft_snippet_topk(spark, sf).collect()}
        assert out[0].n_terms == 3
        assert out[0].snip_start == 2
        assert out[0].snippet == "key value table cc dd ee ff gg"
        assert out[1].n_terms == 1  # gaps exceed the 8-token window

    def test_tie_breaks_earliest_window(self, spark, tmp_root):
        # doc 0: two (3-term, 3-hit) windows tie → earliest anchor wins;
        # doc 1: a richer late window beats a poorer early one
        rows = [
            (0, "key value table xx yy zz ww vv uu tt key value table", "en"),
            (1, "aa key bb cc dd ee ff gg hh ii jj kk key value table", "en"),
        ]
        sf = _mini_corpus(spark, tmp_root, "snip2", rows)
        out = {r.doc_id: r for r in ta.ft_snippet_topk(spark, sf).collect()}
        assert out[0].snip_start == 0 and out[0].n_terms == 3
        assert out[1].snip_start == 12 and out[1].n_terms == 3

    def test_window_truncates_at_doc_end(self, spark, tmp_root):
        rows = [(0, "aa bb cc dd ee key value table", "en")]
        sf = _mini_corpus(spark, tmp_root, "snip3", rows)
        r = ta.ft_snippet_topk(spark, sf).collect()[0]
        assert r.snip_start == 5
        assert r.snippet == "key value table"  # only 3 tokens remain

    def test_corpus_snippets_contain_a_query_term(self, spark):
        rows = ta.ft_snippet_topk(spark, SF_DIR).collect()
        assert len(rows) == 10
        for r in rows:
            assert any(t in r.snippet.split() for t in ta.BM25_TERMS)
        # non-degenerate: the highlighter discriminates across result docs
        assert len({r.snippet for r in rows}) > 1


class TestKeywordExtract:
    def test_rare_repeated_term_ranks_first(self, spark, tmp_root):
        rows = [
            (0, "zebra zebra zebra common common", "en"),
            (1, "common common other words here", "en"),
            (2, "common more filler text rows", "en"),
        ]
        sf = _mini_corpus(spark, tmp_root, "kw1", rows)
        out = ta.ft_keyword_extract(spark, sf)
        top0 = out.filter("doc_id = 0 and rk = 1").collect()[0]
        assert top0.term == "zebra" and top0.tf == 3
        # 'common' appears in every doc → idf ln(4/4)=0 → score 0, never #1
        assert not out.filter("term = 'common' and rk = 1").collect()

    def test_topn_is_totally_ordered(self, spark):
        out = ta.ft_keyword_extract(spark, SF_DIR)
        # rk is dense 1..KW_TOPN per doc, no duplicates
        bad = (
            out.groupBy("doc_id")
            .agg(F.count("*").alias("c"), F.countDistinct("rk").alias("d"),
                 F.max("rk").alias("m"))
            .filter((F.col("c") != F.col("d")) | (F.col("m") > ta.KW_TOPN))
        )
        assert bad.count() == 0
        # non-degenerate: scores vary across the corpus
        assert out.select("score").distinct().count() > 1


class TestCooccurPmi:
    def test_collocation_beats_independent_pairs(self, spark, tmp_root):
        # 'san francisco' always adjacent (6x) among independent filler —
        # it must be the top PMI pair; fillers co-occur by chance only.
        filler = "aa bb cc dd ee ff gg hh"
        rows = [
            (i, f"san francisco {filler[: 2 + 3 * (i % 5)]} san francisco", "en")
            for i in range(3)
        ]
        sf = _mini_corpus(spark, tmp_root, "pmi1", rows)
        top = ta.ft_cooccur_pmi(spark, sf).filter("rk = 1").collect()[0]
        assert (top.ta, top.tb) == ("san", "francisco")
        assert top.c_ab >= ta.PMI_MINC

    def test_corpus_pmi_is_discriminating(self, spark):
        rows = ta.ft_cooccur_pmi(spark, SF_DIR).collect()
        assert len(rows) == ta.PMI_TOPN
        assert len({r.pmi for r in rows}) > 1
        assert all(r.c_ab >= ta.PMI_MINC for r in rows)


class TestStratifiedQuotaSample:
    def test_exact_quota_per_stratum(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_by_lang = {r.lang: r.c for r in
                     docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        out = tp.stratified_quota_sample(spark, SF_DIR)
        got = {r.lang: r.c for r in
               out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        for lang, n in n_by_lang.items():
            want = (n * tp.QUOTA_BP + 9999) // 10000
            assert got[lang] == want, (lang, n)

    def test_selects_the_true_smallest_hashes(self, spark, tmp_root):
        # brute-force twin on a crafted corpus: the pruned execution must
        # pick exactly the quota-many smallest salted hashes per stratum
        import hashlib

        rows = [(i, f"doc {i} text", "en" if i % 3 else "nl") for i in range(200)]
        sf = _mini_corpus(spark, tmp_root, "quota1", rows)

        def h56(doc_id):
            m = hashlib.md5(f"{tp.QUOTA_SALT}:{doc_id}".encode()).hexdigest()
            return int(m[:14], 16)

        want = set()
        for lang in ("en", "nl"):
            ids = sorted((h56(i), i) for i, _, l in rows if l == lang)
            q = (len(ids) * tp.QUOTA_BP + 9999) // 10000
            want |= {i for _, i in ids[:q]}
        got = {r.doc_id for r in tp.stratified_quota_sample(spark, sf).collect()}
        assert got == want

    def test_guard_fires_on_undersized_candidate_pool(self, spark, tmp_root, monkeypatch):
        # shrink the hash space constant → cutoff ~0 → empty candidate pool;
        # the operator must FAIL LOUDLY, never silently under-sample (the
        # driver-side cumsum sees the shortfall and raises)
        rows = [(i, f"doc {i}", "en") for i in range(50)]
        sf = _mini_corpus(spark, tmp_root, "quota2", rows)
        monkeypatch.setattr(tp, "_QUOTA_HSPACE", 1)
        with pytest.raises(Exception, match="under quota"):
            tp.stratified_quota_sample(spark, sf).collect()


class TestHybridRrf:
    def test_fusion_math_and_union_semantics(self, spark):
        rows = ta.hybrid_rrf_topk(spark, SF_DIR).collect()
        assert len(rows) == ta.RRF_TOPN
        assert [r.rank for r in rows] == list(range(1, ta.RRF_TOPN + 1))
        # rrf is exactly the sum of the reciprocal-rank terms of the legs
        # that retrieved the doc (union semantics: missing leg adds 0)
        for r in rows:
            want = 0.0
            if r.r_bm is not None:
                want += 1.0 / (ta.RRF_K + r.r_bm)
            if r.r_cos is not None:
                want += 1.0 / (ta.RRF_K + r.r_cos)
            assert r.rrf == round(want, 6)
            assert r.r_bm is not None or r.r_cos is not None
        # non-degenerate: both retrievers contribute to the fused list
        assert any(r.r_bm is not None for r in rows)
        assert any(r.r_cos is not None for r in rows)
        # ordering: rrf strictly non-increasing, ties broken by doc_id
        for a, b in zip(rows, rows[1:]):
            assert (a.rrf, -a.doc_id) >= (b.rrf, -b.doc_id) or a.rrf > b.rrf


class TestEventsSessionize:
    def test_matches_streaming_pandas_oracle(self, spark):
        """Four-way triangulation closure: the distributed batch sessionizer
        must produce the same session boundaries as the streaming operator's
        pure-pandas reference (which the applyInPandasWithState path is
        already tested against), on the real events table."""
        import pandas as pd

        from harvester_spark.operators.relational import events_sessionize
        from harvester_spark.streaming.sessionize import sessionize_batch_oracle

        got = (
            events_sessionize(spark, SF_DIR)
            .select("user_id", "session_start", "session_end", "n_events")
            .toPandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")[["user_id", "ts", "value"]]
        # the pandas oracle expects ns-resolution datetimes (its int64 // 1000
        # -> us); parquet reads as datetime64[us] under pandas 2
        pdf["ts"] = pdf["ts"].astype("datetime64[ns]")
        want = (
            sessionize_batch_oracle(pdf)[
                ["user_id", "session_start", "session_end", "n_events"]
            ]
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        got["n_events"] = got["n_events"].astype("int64")
        want["n_events"] = want["n_events"].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_sessions_are_gap_separated_and_internally_dense(self, spark):
        from harvester_spark.operators.relational import (
            SESSION_GAP_MS,
            events_sessionize,
        )

        out = events_sessionize(spark, SF_DIR).toPandas()
        # session_seq dense per user; consecutive sessions separated > gap
        for _uid, g in out.groupby("user_id"):
            g = g.sort_values("session_seq")
            assert list(g["session_seq"]) == list(range(1, len(g) + 1))
            prev_end = None
            for r in g.itertuples(index=False):
                assert r.session_end >= r.session_start
                if prev_end is not None:
                    gap_ms = (r.session_start - prev_end).total_seconds() * 1000
                    assert gap_ms > SESSION_GAP_MS
                prev_end = r.session_end
        # non-degenerate: multi-event sessions AND multi-session users exist
        assert (out["n_events"] > 1).any()
        assert out.groupby("user_id").size().max() > 1


def test_bpe_fertility_at_least_one(spark):
    """Every word is >= 1 BPE token, so fertility >= 1 per language; the
    word-soup corpus must yield a real (non-unit) fertility somewhere."""
    from harvester_spark.operators.fulltext_queries import ft_bpe_fertility

    rows = ft_bpe_fertility(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["fertility"] >= 1.0 for r in rows)
    assert any(r["fertility"] > 1.0 for r in rows)
    assert all(r["bpe_tokens"] >= r["n_words"] > 0 for r in rows)


def test_langid_confusion_rows_are_probability_rows(spark):
    from harvester_spark.operators.fulltext_queries import ft_langid_confusion

    rows = ft_langid_confusion(spark, "/root/testdata/sf0.001").collect()
    langs = {r["lang"] for r in rows}
    assert len(langs) >= 2
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(x["recall"] for x in rs) - 1.0) < 1e-4
        assert sum(x["n"] for x in rs) > 0


def test_yule_k_exact_python_recompute(spark):
    """All three richness statistics recomputed exactly in Python
    (collections.Counter over the contract tokenizer) at sf0.001 — the
    integer sums are exact and the double ratios follow the same IEEE op
    order, so equality is EXACT, not approximate."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    rows = ta.ft_yule_k(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    tok = re.compile(r"\W+", re.ASCII)
    by_lang: dict[str, Counter] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        c = by_lang.setdefault(lang, Counter())
        c.update(t for t in tok.split(text.lower()) if t)
    assert {r["lang"] for r in rows} == set(by_lang)
    for r in rows:
        c = by_lang[r["lang"]]
        n = sum(c.values())
        v = len(c)
        s2 = sum(cf * cf for cf in c.values())
        sd = sum(cf * (cf - 1) for cf in c.values())
        assert r["n_tokens"] == n and r["n_types"] == v
        assert r["yule_k_micro"] == round(1.0e10 * (s2 - n) / (1.0 * n * n))
        assert r["simpson_d_micro"] == round(1.0e6 * sd / (1.0 * n * (n - 1)))
        assert r["guiraud_r_milli"] == round(1000.0 * v / math.sqrt(1.0 * n))
        # positive controls: the corpus repeats terms (K, D > 0) and has
        # more tokens than types (otherwise every stat degenerates to 0)
        assert r["yule_k_micro"] > 0 and r["simpson_d_micro"] > 0
        assert n > v
