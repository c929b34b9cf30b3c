"""Search-API semantics + reference query set rank identity + rank eval."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_spark.pipeline import run_build
from harvester_spark.queryset import (
    build_expected_topk,
    rank_eval,
    reference_queries,
    synthetic_ratings,
)
from harvester_spark.search.api import Filters, SearchAPI
from harvester_spark.search.sqs import edit_distance_leq as _edit_distance_leq
from harvester_spark.search.engine import IndexSearcher

N_DOCS = 300


@pytest.fixture(scope="module")
def api(spark, tmp_root):
    out = os.path.join(tmp_root, "api")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    documents = spark.read.parquet(f"{out}/documents")
    return SearchAPI(spark, f"{out}/index", documents), out


@pytest.fixture(scope="module")
def docs_pdf(api, spark):
    _, out = api
    return (
        spark.read.parquet(f"{out}/documents")
        .select("doc_id", "text", "lang", "publisher_date", "set_name")
        .toPandas()
    )


def test_reference_query_set_rank_identity(api, docs_pdf, spark):
    """Every fixture query: engine == frozen oracle golden table, exactly."""
    _, out = api
    searcher = IndexSearcher(spark, f"{out}/index")
    queries = reference_queries()
    golden = build_expected_topk(docs_pdf, queries)
    for q in queries.itertuples(index=False):
        got = searcher.search(q.query_text, k=q.k, lang=q.lang).topk
        exp = golden[golden["query_id"] == q.query_id]
        assert list(got["doc_id"]) == list(exp["doc_id"]), q.query_id
        assert (
            np.asarray(got["score"], dtype=np.float64)
            == np.asarray(exp["score"], dtype=np.float64)
        ).all(), q.query_id


def test_rank_eval_ndcg(api, docs_pdf, spark):
    _, out = api
    searcher = IndexSearcher(spark, f"{out}/index")
    queries = reference_queries()
    golden = build_expected_topk(docs_pdf, queries)
    ratings = synthetic_ratings(golden)
    report = rank_eval(searcher, queries, ratings)
    scored = report.dropna(subset=["ndcg"])
    # engine IS the oracle ranking -> top-heavy NDCG must be near-perfect
    assert len(scored) > 30
    assert (scored["ndcg"] > 0.85).all()


def test_filter_or_within_and_across(api):
    papi, _ = api
    r_one = papi.search("w00000", filters=Filters(fields={"set_name": ["alpha"]}))
    r_two = papi.search("w00000", filters=Filters(fields={"set_name": ["alpha", "bravo"]}))
    assert r_two["results_total"]["value"] >= r_one["results_total"]["value"]
    r_none = papi.search(
        "w00000",
        filters=Filters(fields={"set_name": ["alpha"], "lang": ["nl"]}),
    )
    # AND across fields narrows
    assert r_none["results_total"]["value"] <= r_one["results_total"]["value"]


def test_date_range_null_open(api, docs_pdf):
    papi, _ = api
    all_hits = papi.search("w00000")["results_total"]["value"]
    lo = papi.search("w00000", filters=Filters(publisher_date=("1970-05-01", None)))
    hi = papi.search("w00000", filters=Filters(publisher_date=(None, "1970-05-01")))
    assert lo["results_total"]["value"] + hi["results_total"]["value"] >= all_hits
    both = papi.search(
        "w00000", filters=Filters(publisher_date=("1970-03-01", "1970-06-01"))
    )
    assert both["results_total"]["value"] <= all_hits


def test_empty_query_recency_listing(api, docs_pdf):
    papi, _ = api
    r = papi.search("", k=5)
    assert len(r["results"]) == 5
    ids = [x["doc_id"] for x in r["results"]]
    dates = docs_pdf.set_index("doc_id").loc[ids, "publisher_date"]
    assert list(dates) == sorted(dates, reverse=True)
    assert r["results_total"]["value"] == N_DOCS


def test_facet_counts(api, docs_pdf):
    papi, _ = api
    counts = papi.facet_counts(("lang", "set_name"))
    expect_en = (docs_pdf["lang"] == "en").sum()
    assert counts["lang-en"] == expect_en
    assert sum(v for k, v in counts.items() if k.startswith("set_name-")) == N_DOCS


def test_recency_boost_changes_order_not_set(api):
    papi, _ = api
    plain = papi.search("w00000", k=20)
    boosted = papi.search("w00000", k=20, recency_boost=True)
    assert {x["doc_id"] for x in plain["results"]} == {
        x["doc_id"] for x in boosted["results"]
    } or len(plain["results"]) == 20  # small corpora may reorder within top-k


def test_did_you_mean(api):
    papi, _ = api
    # misspelled head term -> suggestion to the real one
    r = papi.did_you_mean("w0000x")
    assert r is not None and r["suggestion"].startswith("w0000")
    # correctly spelled -> no suggestion
    assert papi.did_you_mean("w00000") is None


def test_autocomplete(api):
    papi, _ = api
    hits = papi.autocomplete("w000", n=5)
    assert len(hits) == 5
    assert all(h.startswith("w000") for h in hits)
    # ordered by df desc -> the Zipf head term first
    assert hits[0] == "w00000"


def test_more_like_this(api):
    papi, _ = api
    mlt = papi.more_like_this(0, k=5)
    assert len(mlt) == 5
    assert 0 not in set(mlt["doc_id"])
    assert (mlt["score"].values[:-1] >= mlt["score"].values[1:]).all()


def test_edit_distance():
    assert _edit_distance_leq("abc", "abc") == 0
    assert _edit_distance_leq("abc", "abd") == 1
    assert _edit_distance_leq("abc", "acbd") == 2
    assert _edit_distance_leq("abc", "xyz") is None
    assert _edit_distance_leq("short", "muchlongerterm") is None


def test_quoted_phrase_in_api(api, docs_pdf, spark):
    """Quoted phrase narrows AND results to adjacency matches; mixed
    phrase+term queries intersect both constraints."""
    papi, out = api
    phrase_q = '"block max wand"'
    r_phrase = papi.search(phrase_q, k=100)
    r_and = papi.search("block max wand", k=100)
    assert 0 < r_phrase["results_total"]["value"] <= r_and["results_total"]["value"]

    from harvester_spark.search.phrase import brute_force_phrase

    exp = brute_force_phrase(docs_pdf, "block max wand", k=100)
    assert [x["doc_id"] for x in r_phrase["results"]] == list(exp["doc_id"])

    # scrambled quoted phrase -> (almost certainly) no adjacency matches
    r_scrambled = papi.search('"wand block max"', k=10)
    assert r_scrambled["results_total"]["value"] <= r_phrase["results_total"]["value"]

    # mixed: phrase + extra AND term narrows further
    r_mixed = papi.search('"block max wand" w00000', k=100)
    assert r_mixed["results_total"]["value"] <= r_phrase["results_total"]["value"]


def test_allowed_bitmap_equals_id_filtering(api, docs_pdf, spark):
    """AllowedSet bitmap filtering == raw-id filtering, and the bitmap is
    what the filter path now produces."""
    from harvester_spark.search.allowed import AllowedSet, bitmap_from_df

    papi, _ = api
    ids = docs_pdf[docs_pdf["set_name"] == "alpha"]["doc_id"].to_numpy()
    n_bits = len(papi.searcher._doc_lens())
    aset = AllowedSet.from_ids(ids, n_bits)
    assert aset.count == len(set(ids))
    probe = np.arange(n_bits)
    assert np.array_equal(aset.test(probe), np.isin(probe, ids))
    assert sorted(aset.to_ids()) == sorted(ids)

    built = papi._allowed_ids(Filters(fields={"set_name": ["alpha"]}))
    assert built.count == aset.count
    assert np.array_equal(built.bits, aset.bits)

    r_ids = papi.searcher.search("w00000", k=50, allowed_doc_ids=np.sort(ids))
    r_set = papi.searcher.search("w00000", k=50, allowed_doc_ids=aset)
    assert list(r_ids.topk["doc_id"]) == list(r_set.topk["doc_id"])
    assert r_ids.results_total == r_set.results_total


def test_recency_bounded_rerank_is_exact(api):
    """The bounded doubling re-rank returns exactly what re-ranking EVERY
    match returns — without fetching every match when the bound holds."""
    papi, _ = api
    seen_ks = []
    real_search = papi.searcher.search

    def spy(query_text, k=10, **kw):
        seen_ks.append(k)
        return real_search(query_text, k=k, **kw)

    papi.searcher.search = spy
    try:
        got = papi.search("w00000", k=5, recency_boost=True)
    finally:
        papi.searcher.search = real_search

    # exhaustive reference: boost every match, take top 5
    full = real_search("w00000", k=10**9)
    rer = papi._rerank_recency(full.topk)
    exp = rer.head(5)
    assert [x["doc_id"] for x in got["results"]] == list(exp["doc_id"])
    assert np.allclose(
        [x["score"] for x in got["results"]], np.asarray(exp["score"]), rtol=0, atol=0
    )
    assert got["results_total"]["value"] == full.results_total
    # never asked for an unbounded fetch
    assert max(seen_ks) < 10**9


def test_did_you_mean_gated_on_sparse_results(api):
    """Suggestions are computed only when results are sparse — not on every
    search (round-1: a full-dictionary edit-distance pass per query)."""
    papi, _ = api
    plentiful = papi.search("w00000", k=5)
    assert plentiful["results_total"]["value"] >= 10
    assert plentiful["did_you_mean"] is None


def test_suggest_completion_semantics(api):
    """Reference-parity autocomplete source: alpha-only candidates from the
    first 1000 space-split words (product.py:169-180)."""
    from harvester_spark.analysis import suggest_completion_terms

    # pure builder: title + first words, accent fold, alpha strip
    assert suggest_completion_terms("Café Zee", "b2b fiets10 résumé!") == [
        "Cafe", "Zee", "bb", "fiets", "resume",
    ]
    assert suggest_completion_terms(None, None) == []

    papi, _ = api
    hits = papi.autocomplete("t", n=10, source="suggest")
    assert all(h.isalpha() for h in hits)
    # word-soup corpus: plain-word terms (e.g. 'term' from term_N is stripped
    # to 'term'... digits removed) must surface; digit-bearing ones cannot
    assert all(not any(c.isdigit() for c in h) for h in hits)


# ---------------------------------------------------------------------------
# _source-style hydration: results come back as document records
# (prepare_results_for_response, reference search/clients.py:13-21)
# ---------------------------------------------------------------------------


def test_search_fetch_fields_hydrates_results(api, docs_pdf):
    a, _ = api
    res = a.search("w00000 w00001", k=5, fetch_fields=("srn", "url", "publisher_date"))
    assert res["results"]
    by_id = docs_pdf.set_index("doc_id")
    for r in res["results"]:
        assert set(("srn", "url", "publisher_date")) <= set(r)
        assert r["rank"] >= 1 and "score" in r
    # OR path hydrates too
    res_or = a.search("w00000 term_7", k=5, operator="or", fetch_fields=("srn",))
    assert all("srn" in r for r in res_or["results"])


def test_fetch_documents_request_order_and_pruning(api, spark):
    a, out = api
    docs = spark.read.parquet(f"{out}/documents").select("doc_id", "srn").toPandas()
    want = [int(docs["doc_id"].iloc[7]), int(docs["doc_id"].iloc[3]), int(docs["doc_id"].iloc[11])]
    got = a.fetch_documents(want, fields=("srn",))
    assert [g["doc_id"] for g in got] == want
    exp = docs.set_index("doc_id")["srn"]
    assert [g["srn"] for g in got] == [exp[w] for w in want]
    # unknown ids are silently absent, full-record fetch returns all columns
    assert a.fetch_documents([10**9]) == []
    full = a.fetch_documents(want[:1])
    assert "text" in full[0] and "state" in full[0]


def test_closest_term_vectorized_equals_scalar():
    """_closest_term (vectorized kernel) == a scalar-kernel walk with the
    same candidate pre-filter and (dist, -df, term) tie-break."""
    import pandas as pd

    from harvester_spark.search.api import _closest_term

    d = pd.DataFrame(
        {
            "term": [
                "w00000", "w00001", "w0000", "w000000", "wx0000",
                "block", "blocks", "blocked", "b", "zzzz",
            ],
            "df": [900, 800, 50, 40, 30, 500, 600, 10, 5, 3],
        }
    )

    def scalar(t):
        cand = d[
            (d["term"].str.len().sub(len(t)).abs() <= 2)
            & (d["term"].str[0] == (t[0] if t else ""))
        ]
        best, best_key = None, None
        for term, df_ in zip(cand["term"], cand["df"]):
            dist = _edit_distance_leq(t, term)
            if dist is None or dist == 0:
                continue
            key = (dist, -df_, term)
            if best_key is None or key < best_key:
                best, best_key = term, key
        return best

    for probe in ["w0000x", "block", "bloc", "w00000", "zz", "qqqq", "blokcs"]:
        assert _closest_term(probe, d) == scalar(probe), probe


def test_suggestion_paths_never_materialize_vocabulary(api, spark, monkeypatch):
    """Round-2 verdict item 1: did_you_mean / autocomplete (both sources) /
    MLT idf / SQS fuzzy+prefix expansion must be bounded probes (exact terms,
    a prefix range, or an edit-distance length band) — never a
    full-dictionary toPandas/collect. ``_dictionary()`` is diagnostic-only
    and forbidden here; every ``dict_probe`` must carry a predicate."""
    papi, out = api
    fresh = SearchAPI(spark, f"{out}/index", papi.documents)

    def boom(self):
        raise AssertionError(
            "a serving path materialized the full dictionary on the driver"
        )

    monkeypatch.setattr(SearchAPI, "_dictionary", boom)

    probes: list[int] = []
    orig = IndexSearcher.dict_probe

    def spy(self, lang, terms=None, term_lo=None, term_hi=None,
            tlen_lo=None, tlen_hi=None):
        assert (
            terms is not None or term_lo is not None or tlen_lo is not None
        ), "unbounded dictionary probe on a suggestion path"
        pdf = orig(self, lang, terms=terms, term_lo=term_lo, term_hi=term_hi,
                   tlen_lo=tlen_lo, tlen_hi=tlen_hi)
        probes.append(len(pdf))
        return pdf

    monkeypatch.setattr(IndexSearcher, "dict_probe", spy)

    # did_you_mean: typo corrected, clean query untouched
    r = fresh.did_you_mean("w0000x")
    assert r is not None and r["suggestion"].startswith("w0000")
    assert fresh.did_you_mean("w00000") is None
    # autocomplete, both sources
    hits = fresh.autocomplete("w000", n=5)
    assert hits and all(h.startswith("w000") for h in hits)
    s_hits = fresh.autocomplete("t", n=5, source="suggest")
    assert s_hits and all(h.startswith("t") for h in s_hits)
    # MLT idf lookups are exact-terms probes
    assert len(fresh.more_like_this(4, k=5)) > 0
    # SQS fuzzy + prefix expansion through the engine evaluation path
    from harvester_spark.search.sqs import sqs_search

    fz = sqs_search(fresh.searcher, "w0000x~1", k=5)
    assert len(fz.topk) > 0
    pf = sqs_search(fresh.searcher, "w000*", k=5)
    assert len(pf.topk) > 0

    n_dict = fresh.searcher.dictionary.filter(F.col("lang") == "all").count()
    assert probes and max(probes) < n_dict


def test_did_you_mean_collation(spark, tmp_root):
    """Phrase-suggester collation (round-3): the corrected phrase must have
    matches. The top-ranked candidate by (dist, df) that never co-occurs
    with the present terms is rejected in favor of a collating one; if the
    present terms themselves never co-occur, nothing collates."""
    from harvester_spark.index.build import IndexBuilder

    rows = [(i, "candy sweet treat shop", "en") for i in range(20)]
    rows += [
        (20, "anchor candx harbor dock", "en"),
        (21, "anchor harbor boat", "en"),
        (22, "lonely word island", "en"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l, len(t.split())) for i, t, l in rows],
        "doc_id long, text string, lang string, doc_len long",
    )
    idx = os.path.join(tmp_root, "dym_collate_idx")
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=2)
    api = SearchAPI(spark, idx, docs)

    # 'candy' (df 20) outranks 'candx' (df 1) at distance 1, but never
    # co-occurs with 'anchor' — collation picks 'candx'
    r = api.did_you_mean("anchor candz")
    assert r == {"original": "anchor candz", "suggestion": "anchor candx"}
    # no present anchor terms → trivial collation → highest-df candidate
    assert api.did_you_mean("candz")["suggestion"] == "candy"
    # present terms that never co-occur → nothing can collate → None
    assert api.did_you_mean("anchor lonely candz") is None
    # fully spelled / hopeless typo → None
    assert api.did_you_mean("anchor harbor") is None
    assert api.did_you_mean("zzzzzz") is None


def test_dict_probe_exact_on_legacy_layout(api, spark, tmp_root):
    """Indexes written before the (lang, tlen, term) range-clustered layout
    have no tlen column — probes must stay EXACT (post-filtered), just
    unpruned. Rewrites the dictionary without tlen and compares every probe
    class plus the suggestion surfaces against the new-layout answers."""
    import shutil

    papi, out = api
    legacy = os.path.join(tmp_root, "legacy_idx")
    shutil.rmtree(legacy, ignore_errors=True)
    shutil.copytree(f"{out}/index", legacy)
    d = spark.read.parquet(f"{out}/index/dictionary").drop("tlen")
    tmp_dict = os.path.join(tmp_root, "legacy_dict")
    d.write.mode("overwrite").parquet(tmp_dict)
    shutil.rmtree(os.path.join(legacy, "dictionary"))
    shutil.copytree(tmp_dict, os.path.join(legacy, "dictionary"))

    new_s = IndexSearcher(spark, f"{out}/index")
    old_s = IndexSearcher(spark, legacy)
    assert "tlen" not in old_s.dictionary.columns
    probes = [
        dict(terms=["w00000", "w00001", "nope"]),
        dict(term_lo="w000", term_hi="w000\x7f"),
        dict(tlen_lo=5, tlen_hi=7),
        dict(term_lo="w", term_hi="x", tlen_lo=4, tlen_hi=8),
    ]
    for kw in probes:
        a = new_s.dict_probe("all", **kw).sort_values("term").reset_index(drop=True)
        b = old_s.dict_probe("all", **kw).sort_values("term").reset_index(drop=True)
        assert a.equals(b), kw

    old_api = SearchAPI(spark, legacy, papi.documents)
    assert old_api.did_you_mean("w0000x") == papi.did_you_mean("w0000x")
    assert old_api.autocomplete("w000", 5) == papi.autocomplete("w000", 5)


def test_index_time_suggest_table(api, spark, tmp_root):
    """IndexBuilder.build(suggest=True) persists the completion-suggester
    table; SearchAPI serves suggest-source autocomplete from it with
    identical answers to the lazy per-instance build — and a delta'd index
    falls back to the lazy path so delta vocabulary stays visible."""
    import shutil

    from harvester_spark.index.build import IndexBuilder

    papi, out = api
    docs = spark.read.parquet(f"{out}/documents")
    idx = os.path.join(tmp_root, "suggest_idx")
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=4, suggest=True)
    assert os.path.isdir(os.path.join(idx, "suggest"))
    a = SearchAPI(spark, idx, docs)
    got = a.autocomplete("t", 5, source="suggest")
    want = papi.autocomplete("t", 5, source="suggest")  # lazy-path twin
    assert got == want and got
    # the built table really served it (no lazy temp dir was created)
    assert getattr(a, "_suggest_tmp", None) is None


def test_nonresume_rebuild_clears_stale_suggest(api, spark, tmp_root):
    """A fresh (resume=False) rebuild without suggest=True must remove the
    previous build's suggest table — otherwise SearchAPI would silently
    serve the OLD corpus's vocabulary from it."""
    from harvester_spark.index.build import IndexBuilder

    papi, out = api
    docs = spark.read.parquet(f"{out}/documents")
    idx = os.path.join(tmp_root, "stale_suggest_idx")
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=4, suggest=True)
    assert os.path.isdir(os.path.join(idx, "suggest"))
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=4)
    assert not os.path.isdir(os.path.join(idx, "suggest"))
    a = SearchAPI(spark, idx, docs)
    assert a.autocomplete("t", 5, source="suggest") == papi.autocomplete(
        "t", 5, source="suggest"
    )
    assert a._suggest_tmp is not None  # served by the lazy build


def test_partial_suggest_dir_falls_back_lazy(api, spark, tmp_root):
    """A suggest stage killed mid-write (dir exists, no _SUCCESS) must not
    be preferred — the lazy build serves instead."""
    from harvester_spark.index.build import IndexBuilder

    papi, out = api
    docs = spark.read.parquet(f"{out}/documents")
    idx = os.path.join(tmp_root, "torn_suggest_idx")
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=4, suggest=True)
    os.remove(os.path.join(idx, "suggest", "_SUCCESS"))
    a = SearchAPI(spark, idx, docs)
    got = a.autocomplete("t", 5, source="suggest")
    assert got == papi.autocomplete("t", 5, source="suggest") and got
    assert a._suggest_tmp is not None  # lazy fallback, not the torn dir


def test_suggest_state_filter_parity(api, spark, tmp_root):
    """With a soft-delete state column, built and lazy suggest tables must
    answer identically: both exclude inactive docs' vocabulary."""
    from pyspark.sql import functions as F

    from harvester_spark.index.build import IndexBuilder

    _, out = api
    base = spark.read.parquet(f"{out}/documents")
    docs = base.withColumn(
        "state",
        F.when(F.col("doc_id") % 2 == 0, F.lit("active")).otherwise(F.lit("deleted")),
    ).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("text")
        ).otherwise(F.concat(F.col("text"), F.lit(" zzonlydeleted"))),
    )
    idx = os.path.join(tmp_root, "state_suggest_idx")
    IndexBuilder(spark, idx).build(docs, resume=False, num_partitions=4, suggest=True)
    built = SearchAPI(spark, idx, docs)
    got = built.autocomplete("t", 5, source="suggest")
    assert getattr(built, "_suggest_tmp", None) is None  # served from built table
    assert built.autocomplete("zzonlydeleted", 5, source="suggest") == []

    lazy = SearchAPI(spark, idx, docs)
    import shutil

    shutil.rmtree(os.path.join(idx, "suggest"))
    assert lazy.autocomplete("t", 5, source="suggest") == got
    assert lazy.autocomplete("zzonlydeleted", 5, source="suggest") == []
    assert lazy._suggest_tmp is not None
