"""End-to-end build + rank-identity suite over the synthetic corpus.

The rank-identical BM25 contract of BASELINE.json: engine top-k (docIDs AND
float64 scores) must equal the independent brute-force oracle exactly, for a
query battery covering head terms, multi-term AND, planted phrases, rare
``term_{ix}`` markers, the zero-hit term, and language-scoped search.
"""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.corpus import ZERO_HIT_TERM
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.oracle import brute_force_topk

N_DOCS = 300


@pytest.fixture(scope="session")
def built(spark, tmp_root):
    out = os.path.join(tmp_root, "e2e")
    tables = run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=8)
    return out, tables


@pytest.fixture(scope="session")
def docs_pdf(built, spark):
    out, _ = built
    return (
        spark.read.parquet(f"{out}/documents")
        .select("doc_id", "text", "lang", "doc_len", "publisher_date", "srn")
        .toPandas()
    )


def test_doc_ids_dense(built):
    _, tables = built
    ids = [r["doc_id"] for r in tables["documents"].select("doc_id").collect()]
    assert sorted(ids) == list(range(N_DOCS))


def test_dictionary_consistent_with_postings(built):
    """df in dictionary == decoded posting count == sum of block n per term."""
    _, tables = built
    block_counts = (
        tables["postings"].groupBy("term", "lang").agg(F.sum("n").alias("n"))
    )
    joined = (
        tables["dictionary"]
        .filter(F.col("lang") != "all")
        .join(block_counts, ["term", "lang"], "full")
        .filter((F.col("df") != F.col("n")) | F.col("df").isNull() | F.col("n").isNull())
    )
    assert joined.count() == 0


def test_all_lang_df_is_sum(built):
    _, tables = built
    d = tables["dictionary"]
    per = d.filter(F.col("lang") != "all").groupBy("term").agg(F.sum("df").alias("s"))
    allr = d.filter(F.col("lang") == "all").select("term", "df")
    bad = per.join(allr, "term").filter(F.col("s") != F.col("df"))
    assert bad.count() == 0


def test_corpus_stats(built):
    _, tables = built
    stats = {r["lang"]: r for r in tables["corpus_stats"].collect()}
    assert stats["all"]["n_docs"] == N_DOCS
    assert stats["en"]["n_docs"] + stats["nl"]["n_docs"] + stats["unk"]["n_docs"] == N_DOCS


QUERY_BATTERY = [
    "w00000",                       # head term
    "w00000 w00001",                # two head terms AND
    "w00001 w00002 w00003",         # three-term AND
    "w04999",                       # tail term
    "term_7",                       # unique rare marker
    "block max wand",               # planted phrase
    "inverted index construction",  # planted phrase
    ZERO_HIT_TERM,                  # never generated -> empty
    "nlonlyterm",                   # nl-only term
    "w00000 " + ZERO_HIT_TERM,      # AND with dead term -> empty
    "The W00000",                   # case folding
]


@pytest.mark.parametrize("query", QUERY_BATTERY)
@pytest.mark.parametrize("lang", ["all", "en", "nl", "unk"])
def test_rank_identical(built, docs_pdf, spark, query, lang):
    out, _ = built
    searcher = IndexSearcher(spark, f"{out}/index")
    eng = searcher.search(query, k=10, lang=lang).topk
    ora = brute_force_topk(docs_pdf, query, k=10, lang=lang)
    assert list(eng["doc_id"]) == list(ora["doc_id"])
    e = np.asarray(eng["score"], dtype=np.float64)
    o = np.asarray(ora["score"], dtype=np.float64)
    assert e.shape == o.shape
    assert (e == o).all()  # exact float equality, not approx


def test_pagination(built, spark):
    out, _ = built
    searcher = IndexSearcher(spark, f"{out}/index")
    full = searcher.search("w00000", k=20).topk
    p1 = searcher.search("w00000", k=10, page=1).topk
    p2 = searcher.search("w00000", k=10, page=2).topk
    assert list(p1["doc_id"]) + list(p2["doc_id"]) == list(full["doc_id"])
    assert list(p2["rank"]) == list(range(11, 11 + len(p2)))


def test_results_total_precise(built, spark):
    out, _ = built
    searcher = IndexSearcher(spark, f"{out}/index")
    res = searcher.search("w00000", k=5)
    assert res.is_precise
    assert res.results_total >= len(res.topk)


def test_filter_prerestriction(built, docs_pdf, spark):
    """Date-style filters as allowed-id pre-restriction (AND with text match)."""
    out, _ = built
    searcher = IndexSearcher(spark, f"{out}/index")
    allowed = docs_pdf[docs_pdf["doc_id"] % 2 == 0]["doc_id"].to_numpy()
    eng = searcher.search("w00000", k=10, allowed_doc_ids=allowed).topk
    ora = brute_force_topk(docs_pdf, "w00000", k=10, allowed_doc_ids=allowed)
    assert list(eng["doc_id"]) == list(ora["doc_id"])
    assert (np.asarray(eng["score"]) == np.asarray(ora["score"])).all()
    assert all(d % 2 == 0 for d in eng["doc_id"])


def test_resume_skips_completed_stages(spark, tmp_root):
    """Anti-join-completed resumability: a second build run re-runs nothing,
    and a deleted shard is rebuilt while complete shards are skipped."""
    from harvester_spark.index.build import IndexBuilder

    out = os.path.join(tmp_root, "resume")
    tables = run_build(spark, out, n_docs=120, resume=False, n_shards=3, num_partitions=4)
    postings_before = _decode_logical(tables["postings"])

    # Full resume: everything skipped.
    docs = spark.read.parquet(f"{out}/documents")
    b2 = IndexBuilder(spark, f"{out}/index", build_id="build-resume")
    b2.build(docs, resume=True, n_shards=3, num_partitions=4)
    lineage = spark.read.parquet(f"{out}/index/lineage")
    skipped = lineage.filter(
        (F.col("build_id") == "build-resume") & (F.col("status") == "skipped")
    ).count()
    assert skipped >= 4  # doc_stats, corpus_stats, dictionary, 3 shards

    # Kill one shard; resume rebuilds only that shard, result identical.
    shutil.rmtree(f"{out}/index/postings/shard=1")
    b3 = IndexBuilder(spark, f"{out}/index", build_id="build-repair")
    t3 = b3.build(docs, resume=True, n_shards=3, num_partitions=4)
    lineage = spark.read.parquet(f"{out}/index/lineage")
    repaired = lineage.filter(
        (F.col("build_id") == "build-repair") & (F.col("stage") == "postings")
    )
    statuses = {r["partition_id"]: r["status"] for r in repaired.collect()}
    assert statuses[1] == "completed" and statuses[0] == "skipped" and statuses[2] == "skipped"
    # Physical block boundaries may shift with range-partition sampling, but
    # the LOGICAL postings (term -> [(doc_id, tf)]) must be identical.
    postings_after = _decode_logical(t3["postings"])
    assert postings_before.equals(postings_after)


def _decode_logical(postings_df):
    """Decode a postings block table to a sorted logical (term, doc_id, tf) frame."""
    import pandas as pd
    from harvester_spark.index.codec import decode_block

    pdf = postings_df.select(
        "lang", "term", "base_doc_id", "doc_deltas", "tfs"
    ).toPandas()
    rows = []
    for r in pdf.itertuples(index=False):
        ids, tfs = decode_block(r.base_doc_id, r.doc_deltas, r.tfs)
        for d, t in zip(ids, tfs):
            rows.append((r.lang, r.term, int(d), int(t)))
    return (
        pd.DataFrame(rows, columns=["lang", "term", "doc_id", "tf"])
        .sort_values(["lang", "term", "doc_id"])
        .reset_index(drop=True)
    )


def test_doc_lens_mmap_sidecar(spark, tmp_root):
    """First open builds doc_lens.f8.npy next to the snapshot's doc_stats;
    later searchers memory-map it (shared page cache, no per-searcher dense
    copy) and serve identical lengths."""
    import numpy as np

    from harvester_spark.pipeline import run_build
    from harvester_spark.search.engine import IndexSearcher

    out = os.path.join(tmp_root, "lens_sidecar")
    run_build(spark, out, n_docs=120, resume=False, num_partitions=4)
    idx = f"{out}/index"
    s1 = IndexSearcher(spark, idx)
    a1 = s1._doc_lens()
    sidecar = os.path.join(idx, "doc_lens.f8.npy")
    assert os.path.exists(sidecar)
    s2 = IndexSearcher(spark, idx)
    a2 = s2._doc_lens()
    assert isinstance(a2, np.memmap)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    # serving result unchanged through the mmap path
    r = s2.search("w00000", k=5)
    assert len(r.topk) == 5
