"""simple_query_string grammar: parser shapes, engine == brute-force oracle
rank identity (exact float64 scores), API routing, adversarial fuzz."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.pipeline import run_build
from harvester_spark.search.api import SearchAPI
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.sqs import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Term,
    brute_force_sqs,
    has_operators,
    parse,
    sqs_search,
)

N_DOCS = 300


@pytest.fixture(scope="module")
def sqs_env(spark, tmp_root):
    out = os.path.join(tmp_root, "sqs")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    searcher = IndexSearcher(spark, f"{out}/index")
    docs_pdf = (
        spark.read.parquet(f"{out}/documents")
        .select("doc_id", "text", "lang")
        .toPandas()
    )
    return searcher, docs_pdf, out


# ------------------------------------------------------------------ parser


def test_parse_shapes():
    assert parse("a b") == And(Term("a"), Term("b"))
    assert parse("a | b") == Or(Term("a"), Term("b"))
    # equal precedence, left-associative (Lucene SimpleQueryParser)
    assert parse("a b | c") == Or(And(Term("a"), Term("b")), Term("c"))
    assert parse("a | b c") == And(Or(Term("a"), Term("b")), Term("c"))
    assert parse("a (b | c)") == And(Term("a"), Or(Term("b"), Term("c")))
    assert parse("-a b") == And(Not(Term("a")), Term("b"))
    assert parse("a -b") == And(Term("a"), Not(Term("b")))
    assert parse('"x y" z') == And(Phrase(["x", "y"]), Term("z"))
    assert parse("pre* b") == And(Prefix("pre"), Term("b"))
    assert parse("-a") == Not(Term("a"))
    # single-word phrase degrades to a term
    assert parse('"solo"') == Term("solo")
    # mid-word hyphen is NOT negation (analyzer splits, plain AND)
    assert parse("state-of") == And(Term("state"), Term("of"))
    # stray ')' skipped, unbalanced '(' and quote are lenient
    assert parse("a ) b") == And(Term("a"), Term("b"))
    assert parse("(a b") == And(Term("a"), Term("b"))
    assert parse('"x y') == Phrase(["x", "y"])
    assert parse("") is None
    assert parse("...!") is None
    # uppercase folds like the analyzer
    assert parse("A -B") == And(Term("a"), Not(Term("b")))
    # fuzzy: bare ~ defaults to 2, ~0 degrades to the term, caps at 2
    assert parse("valu~1 x") == And(Fuzzy("valu", 1), Term("x"))
    assert parse("foo~") == Fuzzy("foo", 2)
    assert parse("foo~0") == Term("foo")
    assert parse("foo~9") == Fuzzy("foo", 2)
    # phrase slop; bare ~ after a quote is lenient slop-0
    assert parse('"x y"~2 z') == And(Phrase(["x", "y"], 2), Term("z"))
    assert parse('"x y"~ z') == And(Phrase(["x", "y"], 0), Term("z"))
    # single-word phrase with slop still degrades to a term
    assert parse('"solo"~3') == Term("solo")


def test_has_operators_routing():
    assert not has_operators("a b")
    assert not has_operators('"x y" z')  # phrases stay on the phrase path
    assert not has_operators("state-of-the-art")
    assert has_operators("a -b")
    assert has_operators("a | b")
    assert has_operators("pre*")
    assert has_operators("(a b) c")
    assert has_operators("a~1")
    assert has_operators("a~")
    assert has_operators('"x y"~2')
    assert not has_operators('"x y"~')  # lenient slop-0 stays a plain phrase


# ----------------------------------------------------- engine == oracle


SQS_QUERIES = [
    "w00000 -w00001",
    "-w00000 w00001",
    "w00000 | w00001",
    "w00000 w00001 | term_7",
    "w00000 | w00001 term_7",
    "(w00000 | w00001) -term_7",
    "w0000*",
    "w0000* -w00001",
    "term_* w00000",
    '"w00000 w00001" | term_7',
    "w00000 | -w00001",  # MUST_NOT applies level-wide
    "-w00000",  # pure negative: matches nothing
    "w00000 -zzzz_nohit",  # dead negative term: no-op
    "zzzz_nohit | w00000",  # dead OR branch
    "(w00000 -w00001) | (w00001 -w00000)",  # symmetric difference
    "w00000~1",  # fuzzy: dense single-substitution family
    "w00000~1 term_7",
    "w0000x~1 | term_7",  # fuzzy on an absent term still expands
    "zzzz_nohit~1",  # fuzzy with an empty expansion
    '"w00000 w00001"~2',  # ordered proximity
    '"w00000 w00001"~5 -term_7',
    '"w00000 term_7"~3',
    '(w00000~ | w00001) term_7',  # bare ~ = max_edits 2
]


def test_sqs_rank_identity(sqs_env):
    searcher, docs_pdf, _ = sqs_env
    for q in SQS_QUERIES:
        for lang in ["all", "en", "nl"]:
            got = sqs_search(searcher, q, k=15, lang=lang).topk
            exp = brute_force_sqs(docs_pdf, q, k=15, lang=lang)
            assert list(got["doc_id"]) == list(exp["doc_id"]), (q, lang)
            assert (
                np.asarray(got["score"], dtype=np.float64)
                == np.asarray(exp["score"], dtype=np.float64)
            ).all(), (q, lang)


def test_sqs_totals_and_semantics(sqs_env):
    searcher, docs_pdf, _ = sqs_env
    # negation total == AND total minus docs containing the negated term
    both = sqs_search(searcher, "w00000 w00001", k=1).results_total
    neg = sqs_search(searcher, "w00000 -w00001", k=1).results_total
    w0 = sqs_search(searcher, "w00000", k=1).results_total
    assert neg == w0 - both
    assert sqs_search(searcher, "-w00000", k=5).results_total == 0
    # OR total == union
    w1 = sqs_search(searcher, "w00001", k=1).results_total
    union = sqs_search(searcher, "w00000 | w00001", k=1).results_total
    assert union == w0 + w1 - both
    # prefix matches at least its exact term's docs
    pre = sqs_search(searcher, "w0000*", k=1).results_total
    assert pre >= w0


def test_sqs_fuzz(sqs_env):
    """Random operator queries over a skewed vocabulary: engine == oracle."""
    import random

    searcher, docs_pdf, _ = sqs_env
    rng = random.Random(42)
    vocab = ["w00000", "w00001", "w00002", "term_7", "term_8", "customer",
             "zzzz_nohit"]

    def atom():
        r = rng.random()
        if r < 0.15:
            return f"{rng.choice(vocab)[:4]}*"
        if r < 0.3:
            slop = "" if rng.random() < 0.5 else f"~{rng.randint(1, 6)}"
            return f'"{rng.choice(vocab)} {rng.choice(vocab)}"{slop}'
        if r < 0.42:
            w = rng.choice(vocab)
            if rng.random() < 0.5:  # mutate a char so expansion is non-trivial
                i = rng.randrange(len(w))
                w = w[:i] + rng.choice("xyz0") + w[i + 1 :]
            return f"{w}~{rng.choice(['', '1', '2'])}"
        return rng.choice(vocab)

    for _ in range(60):
        parts = []
        for _j in range(rng.randint(2, 5)):
            a = atom()
            if rng.random() < 0.25:
                a = "-" + a
            parts.append(a)
            if rng.random() < 0.3:
                parts.append("|")
        if rng.random() < 0.3:
            parts.insert(rng.randrange(len(parts)), "(")
            parts.append(")")
        q = " ".join(parts)
        got = sqs_search(searcher, q, k=10).topk
        exp = brute_force_sqs(docs_pdf, q, k=10)
        assert list(got["doc_id"]) == list(exp["doc_id"]), q
        assert (
            np.asarray(got["score"], dtype=np.float64)
            == np.asarray(exp["score"], dtype=np.float64)
        ).all(), q


# ------------------------------------------------------------------- API


def test_api_sqs_routing(sqs_env, spark):
    searcher, docs_pdf, out = sqs_env
    documents = spark.read.parquet(f"{out}/documents")
    api = SearchAPI(spark, f"{out}/index", documents)
    r = api.search("w00000 -w00001", k=5)
    exp = brute_force_sqs(docs_pdf, "w00000 -w00001", k=5)
    assert [x["doc_id"] for x in r["results"]] == list(exp["doc_id"])
    assert r["results_total"]["is_precise"] is True
    # paging: page 2 continues the ranking
    r1 = api.search("w00000 | w00001", k=5, page=1)["results"]
    r2 = api.search("w00000 | w00001", k=5, page=2)["results"]
    exp10 = brute_force_sqs(docs_pdf, "w00000 | w00001", k=10)
    assert [x["doc_id"] for x in r1 + r2] == list(exp10["doc_id"])
    assert [x["rank"] for x in r2] == [6, 7, 8, 9, 10]
    # hydration works on the SQS path
    h = api.search("w00000 -w00001", k=3, fetch_fields=("url",))
    assert all("url" in x for x in h["results"])
    # filters compose (set_name restriction narrows the result set)
    from harvester_spark.search.api import Filters

    some_set = documents.select("set_name").first()["set_name"]
    rf = api.search(
        "w00000 | w00001", k=5, filters=Filters(fields={"set_name": [some_set]})
    )
    allowed_ids = set(
        r["doc_id"]
        for r in documents.filter(F.col("set_name") == some_set)
        .select("doc_id")
        .collect()
    )
    assert all(x["doc_id"] in allowed_ids for x in rf["results"])
    unfiltered = api.search("w00000 | w00001", k=5)["results_total"]["value"]
    assert rf["results_total"]["value"] <= unfiltered
    # recency boost on an operator query returns a full page without raising
    rb = api.search("w00000 -w00001", k=5, recency_boost=True)
    assert len(rb["results"]) == len(exp)
    assert set(x["doc_id"] for x in rb["results"]).issubset(
        set(brute_force_sqs(docs_pdf, "w00000 -w00001", k=10**6)["doc_id"])
    )


def test_sqs_over_deltas(sqs_env, spark, tmp_root):
    """The SQS evaluator runs unchanged over DeltaSearcher's block view."""
    import shutil

    from harvester_spark.corpus import corpus_pdf
    from harvester_spark.streaming.incremental import (
        DeltaSearcher,
        apply_index_delta,
        changed_and_deleted,
        merge_documents,
        normalize_delta,
    )

    _searcher, _docs_pdf, out = sqs_env
    docs = spark.read.parquet(f"{out}/documents")
    inc = os.path.join(tmp_root, "sqs_inc")
    shutil.rmtree(inc, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc)
    pdf = corpus_pdf(np.array([3]))
    pdf["html"] = [b"<p>sqsdelta unique marker w00000</p>"]
    pdf["deleted"] = False
    merged = merge_documents(docs, normalize_delta(spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, "
             "lang string, deleted boolean")))
    m_path = os.path.join(tmp_root, "sqs_inc_docs")
    merged.write.mode("overwrite").parquet(m_path)
    merged = spark.read.parquet(m_path)
    fresh, tomb = changed_and_deleted(docs, merged)
    apply_index_delta(spark, inc, merged, fresh, tomb)
    ds = DeltaSearcher(spark, inc)
    merged_pdf = merged.filter("state = 'active'").select(
        "doc_id", "text", "lang").toPandas()
    # prefix/fuzzy expansion unions the deltas' distinct term set with the
    # base dictionary (delta_terms), so the delta-only term 'sqsdelta'
    # expands too; expanded terms are served through the delta-aware block
    # view; sloppy phrases read positional postings from the delta
    for q in [
        "sqsdelta -w00001",
        "w00000 -sqsdelta",
        "sqsdelta | w00001",
        "w0000x~1 sqsdelta",
        '"sqsdelta marker"~1',
        '"sqsdelta unique"~3',
        "sqsdelt*",
        "sqsdeltaz~1",
        "sqsdel* -w00001",
    ]:
        got = sqs_search(ds, q, k=10).topk
        exp = brute_force_sqs(merged_pdf, q, k=10)
        assert list(got["doc_id"]) == list(exp["doc_id"]), q
        assert (
            np.asarray(got["score"], dtype=np.float64)
            == np.asarray(exp["score"], dtype=np.float64)
        ).all(), q


# -------------------------------------------- vectorized Levenshtein kernel


def test_levenshtein_vec_matches_scalar_kernel():
    """levenshtein_leq_vec (engine fuzzy expansion) == edit_distance_leq
    (brute oracle) membership over a randomized dictionary — the two
    kernels are independent implementations by design."""
    from harvester_spark.search.sqs import edit_distance_leq, levenshtein_leq_vec

    rng = np.random.default_rng(42)
    alpha = np.array(list("abcdz_139"))
    cands = [
        "".join(rng.choice(alpha, size=rng.integers(0, 9)))
        for _ in range(400)
    ] + ["", "a", "abcd", "abcdabcd"]
    queries = ["abcd", "a", "z_1", "abcdabc", "q"]
    width = max(len(c) for c in cands)
    mat = np.zeros((len(cands), width), dtype=np.uint8)
    lens = np.array([len(c) for c in cands], dtype=np.int64)
    for ix, c in enumerate(cands):
        mat[ix, : len(c)] = np.frombuffer(c.encode(), dtype=np.uint8)
    for q in queries:
        for maxd in (0, 1, 2):
            got = levenshtein_leq_vec(mat, lens, q, maxd)
            exp = np.array(
                [edit_distance_leq(q, c, maxd) is not None for c in cands]
            )
            assert (got == exp).all(), (q, maxd)
