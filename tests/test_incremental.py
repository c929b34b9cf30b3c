"""Incremental-update contract: MERGE semantics, delta index == full rebuild,
webhook streaming ingest."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.corpus import corpus_pdf, generate_corpus
from harvester_spark.index.build import IndexBuilder
from harvester_spark.index.catalog import IndexCatalog
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.streaming.incremental import (
    apply_index_delta,
    changed_and_deleted,
    merge_documents,
    normalize_delta,
)

N_DOCS = 200


def _delta_corpus(spark):
    """Delta: 2 modified docs (5, 17), 2 new docs (10_001, 10_002), 1 delete (23)."""
    import pandas as pd

    base_rows = corpus_pdf(np.array([5, 17, 23]))
    mod = base_rows.copy()
    mod["html"] = [
        b"<p>completely new text five alpha</p>",
        b"<p>completely new text seventeen bravo</p>",
        base_rows["html"].iloc[2],  # unchanged payload for the delete row
    ]
    mod["deleted"] = [False, False, True]
    new = corpus_pdf(np.array([10_001, 10_002]))
    new["deleted"] = False
    pdf = pd.concat([mod, new], ignore_index=True)
    return spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, lang string, deleted boolean"
    )


@pytest.fixture(scope="module")
def incr(spark, tmp_root):
    out = os.path.join(tmp_root, "incr")
    tables = run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=4)
    base = spark.read.parquet(f"{out}/documents")
    delta = normalize_delta(_delta_corpus(spark))
    merged = merge_documents(base, delta)
    merged_path = os.path.join(out, "documents_v2")
    merged.write.mode("overwrite").parquet(merged_path)
    merged = spark.read.parquet(merged_path)
    return out, base, delta, merged


def test_merge_semantics(incr, spark):
    out, base, delta, merged = incr
    n_base = base.count()
    assert merged.count() == n_base + 2  # two inserts

    # unchanged doc keeps its row untouched
    some = base.filter(~F.col("url").rlike("/(00000005|00000017|00000023)$")).first()
    after = merged.filter(F.col("srn") == some["srn"]).first()
    assert after["content_hash"] == some["content_hash"]
    assert after["modified_at"] == some["modified_at"]
    assert after["doc_id"] == some["doc_id"]

    # updated doc: same doc_id, new hash, bumped modified_at
    b5 = base.filter(F.col("url").endswith("00000005")).first()
    a5 = merged.filter(F.col("url").endswith("00000005")).first()
    assert a5["doc_id"] == b5["doc_id"]
    assert a5["content_hash"] != b5["content_hash"]
    assert "completely" in a5["text"]

    # deleted doc: state flipped, deleted_at set, payload kept
    a23 = merged.filter(F.col("url").endswith("00000023")).first()
    assert a23["state"] == "deleted"
    assert a23["deleted_at"] is not None

    # inserts: dense new ids continuing after max base id
    max_base = base.agg(F.max("doc_id")).collect()[0][0]
    new_ids = sorted(
        r["doc_id"]
        for r in merged.filter(F.col("url").rlike("/1000[12]$|/0010000[12]$")).collect()
    )
    inserted = merged.filter(F.col("doc_id") > max_base)
    assert inserted.count() == 2
    got = sorted(r["doc_id"] for r in inserted.collect())
    assert got == [max_base + 1, max_base + 2]


def test_changed_and_deleted(incr):
    out, base, delta, merged = incr
    fresh, tombstones = changed_and_deleted(base, merged)
    assert fresh.count() == 4  # 2 updates + 2 inserts
    assert tombstones.count() == 3  # 2 updated (old postings) + 1 deleted


def test_delta_equals_rebuild(incr, spark, tmp_root):
    """base ∪ delta answers == full-rebuild answers, bit-for-bit."""
    from harvester_spark.streaming.incremental import DeltaSearcher

    out, base, delta, merged = incr
    fresh, tombstones = changed_and_deleted(base, merged)

    # incremental path: copy base index dir, apply delta
    import shutil

    inc_dir = os.path.join(tmp_root, "incr_index")
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc_dir)
    apply_index_delta(spark, inc_dir, merged, fresh, tombstones)

    # rebuild path: fresh index over the merged table
    rb = IndexBuilder(spark, os.path.join(tmp_root, "incr_rebuild"))
    rb.build(merged, resume=False, num_partitions=4)

    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, os.path.join(tmp_root, "incr_rebuild"))
    for q in ["w00000", "w00000 w00001", "completely", "alpha completely",
              "term_7", "w00001 w00002"]:
        for lang in ["all", "en", "nl"]:
            a = ds.search(q, k=10, lang=lang).topk
            b = rs.search(q, k=10, lang=lang).topk
            assert list(a["doc_id"]) == list(b["doc_id"]), (q, lang)
            assert (
                np.asarray(a["score"], dtype=np.float64)
                == np.asarray(b["score"], dtype=np.float64)
            ).all(), (q, lang)


def test_deleted_doc_absent(incr, spark, tmp_root):
    from harvester_spark.streaming.incremental import DeltaSearcher

    out, base, delta, merged = incr
    deleted_id = base.filter(F.col("url").endswith("00000023")).first()["doc_id"]
    inc_dir = os.path.join(tmp_root, "incr_index")
    ds = DeltaSearcher(spark, inc_dir)
    res = ds.search("w00000", k=200)
    assert deleted_id not in set(res.topk["doc_id"])


def test_webhook_stream(spark, tmp_root):
    """End-to-end streaming ingest: file drop → merged version promoted."""
    from harvester_spark.streaming.webhook import start_webhook_stream

    root = os.path.join(tmp_root, "webhook")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=60, resume=False, num_partitions=2)

    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    import shutil

    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    drop = os.path.join(root, "drop")
    os.makedirs(drop, exist_ok=True)
    with open(os.path.join(drop, "batch1.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "url": "https://example.org/alpha/99999999",
                    "warc_ts": "2024-01-01T00:00:00.000Z",
                    "html": "<p>webhook pushed document zebra</p>",
                    "lang": "en",
                    "deleted": False,
                }
            )
        )
    q = start_webhook_stream(
        spark, drop, catalog, index_dir, os.path.join(root, "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    assert catalog.current() != "v000000"
    docs = catalog.read_documents(spark)
    pushed = docs.filter(F.col("url").endswith("99999999")).collect()
    assert len(pushed) == 1 and "zebra" in pushed[0]["text"]

    from harvester_spark.streaming.incremental import DeltaSearcher

    ds = DeltaSearcher(spark, index_dir)
    hit = ds.search("zebra", k=5)
    assert list(hit.topk["doc_id"]) == [pushed[0]["doc_id"]]


def test_catalog_promotion(tmp_root):
    cat = IndexCatalog(os.path.join(tmp_root, "cat"))
    os.makedirs(cat.version_dir("a"))
    os.makedirs(cat.version_dir("b"))
    assert cat.current() is None
    cat.promote("a")
    assert cat.current() == "a"
    cat.promote("b")
    assert cat.current() == "b"
    with pytest.raises(FileNotFoundError):
        cat.promote("missing")
    os.makedirs(cat.version_dir("c"))
    cat.promote("c")
    victims = cat.expire(keep=1)
    assert "c" not in victims and cat.current() == "c"


def test_stacked_deltas_equal_rebuild(spark, tmp_root):
    """TWO successive deltas — update-then-update and update-then-delete of
    the same srn across micro-batches — must still equal a rebuild
    bit-for-bit (the advisor's stacked-delta repro: tombstones from delta N
    must filter base AND every delta < N, not base alone)."""
    import pandas as pd
    import shutil

    from harvester_spark.streaming.incremental import DeltaSearcher

    out = os.path.join(tmp_root, "stacked")
    run_build(spark, out, n_docs=N_DOCS, resume=False, num_partitions=4)
    base = spark.read.parquet(f"{out}/documents")
    inc_dir = os.path.join(tmp_root, "stacked_index")
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc_dir)

    def mk_delta(doc_ixs, htmls, deleted):
        pdf = corpus_pdf(np.array(doc_ixs))
        pdf["html"] = htmls
        pdf["deleted"] = deleted
        return spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, deleted boolean",
        )

    # delta 1: update docs 5 and 17
    d1 = mk_delta(
        [5, 17],
        [b"<p>stacked rewrite alpha five</p>", b"<p>stacked rewrite bravo seventeen</p>"],
        [False, False],
    )
    merged1 = merge_documents(base, normalize_delta(d1))
    m1_path = os.path.join(tmp_root, "stacked_docs_v1")
    merged1.write.mode("overwrite").parquet(m1_path)
    merged1 = spark.read.parquet(m1_path)
    fresh1, tomb1 = changed_and_deleted(base, merged1)
    apply_index_delta(spark, inc_dir, merged1, fresh1, tomb1, delta_name="delta-0")

    # delta 2: update doc 5 AGAIN, delete doc 17 (both touched by delta 1)
    d2 = mk_delta(
        [5, 17],
        [b"<p>stacked rewrite charlie five again</p>", b"<p>irrelevant</p>"],
        [False, True],
    )
    merged2 = merge_documents(merged1, normalize_delta(d2))
    m2_path = os.path.join(tmp_root, "stacked_docs_v2")
    merged2.write.mode("overwrite").parquet(m2_path)
    merged2 = spark.read.parquet(m2_path)
    fresh2, tomb2 = changed_and_deleted(merged1, merged2)
    apply_index_delta(spark, inc_dir, merged2, fresh2, tomb2, delta_name="delta-1")

    rb_dir = os.path.join(tmp_root, "stacked_rebuild")
    rb = IndexBuilder(spark, rb_dir)
    rb.build(merged2, resume=False, num_partitions=4)

    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, rb_dir)
    id5 = base.filter(F.col("url").endswith("00000005")).first()["doc_id"]
    id17 = base.filter(F.col("url").endswith("00000017")).first()["doc_id"]

    # delta-1's postings for doc 5 ('alpha') are superseded by delta-2
    assert list(ds.search("alpha", k=10).topk["doc_id"]) == []
    # delta-2's postings win
    assert list(ds.search("charlie", k=10).topk["doc_id"]) == [id5]
    # updated-in-d1 then deleted-in-d2: gone entirely
    assert id17 not in set(ds.search("w00000", k=N_DOCS).topk["doc_id"])
    assert list(ds.search("bravo", k=10).topk["doc_id"]) == []

    for q in ["w00000", "w00000 w00001", "stacked", "charlie stacked",
              "term_7", "w00001 w00002"]:
        for lang in ["all", "en", "nl"]:
            a = ds.search(q, k=10, lang=lang).topk
            b = rs.search(q, k=10, lang=lang).topk
            assert list(a["doc_id"]) == list(b["doc_id"]), (q, lang)
            assert (
                np.asarray(a["score"], dtype=np.float64)
                == np.asarray(b["score"], dtype=np.float64)
            ).all(), (q, lang)

    # duplicate-posting detection: df of a term in BOTH d1 and d2 texts for
    # doc 5 must not be inflated ('stacked'/'rewrite'/'five' appear twice)
    tot = ds.search("rewrite", k=10)
    assert tot.results_total == 1 and list(tot.topk["doc_id"]) == [id5]

    # torn-apply consistency: staged-but-unpublished dirs (crash before the
    # manifest os.replace) must be invisible to a fresh searcher
    shutil.copytree(f"{inc_dir}/postings_delta/delta=delta-1",
                    f"{inc_dir}/postings_delta/delta=torn")
    shutil.copytree(f"{inc_dir}/tombstones/delta-1", f"{inc_dir}/tombstones/torn")
    shutil.copytree(f"{inc_dir}/stats/v000002", f"{inc_dir}/stats/v000099")
    ds2 = DeltaSearcher(spark, inc_dir)
    for q in ["w00000", "charlie stacked", "rewrite"]:
        a, b = ds2.search(q, k=10).topk, ds.search(q, k=10).topk
        assert list(a["doc_id"]) == list(b["doc_id"]), q
        assert (np.asarray(a["score"], np.float64) == np.asarray(b["score"], np.float64)).all(), q


def test_delta_block_interface_serves_or_and_fast_paths(spark, tmp_root):
    """or_search (both strategies) and the conjunctive fast path over a
    stacked-delta index equal the rebuilt index — the block interface
    (_dfs + synthetic _term_postings) carries the post-delta truth to every
    consumer, not just the inherited AND search."""
    from harvester_spark.search.conjunctive import and_search_fast
    from harvester_spark.search.wand import or_search
    from harvester_spark.streaming.incremental import DeltaSearcher

    inc_dir = os.path.join(tmp_root, "stacked_index")
    rb_dir = os.path.join(tmp_root, "stacked_rebuild")
    if not os.path.exists(inc_dir):  # depends on the stacked fixture test
        pytest.skip("stacked fixture not built")
    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, rb_dir)

    for q in ["charlie stacked", "w00000 bravo", "alpha w00001", "term_7 w00000"]:
        for strat in ["wand", "accumulate"]:
            a = or_search(ds, q, k=10, strategy=strat)
            b = or_search(rs, q, k=10, strategy=strat)
            assert list(a["doc_id"]) == list(b["doc_id"]), (q, strat)
            assert (
                np.asarray(a["score"], dtype=np.float64)
                == np.asarray(b["score"], dtype=np.float64)
            ).all(), (q, strat)
    for q in ["w00000 w00001", "charlie stacked"]:
        a = and_search_fast(ds, q, k=10)
        b = and_search_fast(rs, q, k=10)
        assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), q
        assert (a.topk["score"].to_numpy() == b.topk["score"].to_numpy()).all()
    # positional phrase search over the un-compacted stacked deltas must
    # equal the rebuild bit-for-bit: merged position lists, tombstones
    # applied ('rewrite alpha' was superseded in delta-2 → empty on BOTH)
    from harvester_spark.search.phrase import (
        phrase_match_ids,
        positional_phrase_search,
    )

    for ph in [
        "stacked rewrite",
        "charlie five again",
        "rewrite alpha",
        "rewrite bravo",
        "w00000 w00001",
    ]:
        assert list(phrase_match_ids(ds, ph)) == list(phrase_match_ids(rs, ph)), ph
    a = positional_phrase_search(ds, "stacked rewrite", k=10)
    b = positional_phrase_search(rs, "stacked rewrite", k=10)
    assert list(a.topk["doc_id"]) == list(b.topk["doc_id"])
    assert (a.topk["score"].to_numpy() == b.topk["score"].to_numpy()).all()
    assert a.results_total == b.results_total


def test_delta_common_grams_phrase(spark, tmp_root):
    """A delta applied to a common-grams build must emit bigram tokens for
    its fresh docs (apply_index_delta re-reads the build's term list), so
    bigram-accelerated phrase matching sees post-delta truth."""
    import shutil

    from harvester_spark.index.build import IndexBuilder
    from harvester_spark.search.phrase import phrase_match_ids
    from harvester_spark.streaming.incremental import DeltaSearcher

    out = os.path.join(tmp_root, "cg_delta")
    run_build(spark, out, n_docs=60, resume=False, num_partitions=2)
    docs = spark.read.parquet(f"{out}/documents")
    cg = ["w00000", "w00001"]
    idx_dir = os.path.join(tmp_root, "cg_delta_index")
    IndexBuilder(spark, idx_dir).build(
        docs, resume=False, num_partitions=2, common_gram_terms=cg
    )

    import pandas as pd

    pdf = corpus_pdf(np.array([20_001]))
    pdf["html"] = [b"<p>fresh w00000 w00001 adjacency from the delta</p>"]
    pdf["deleted"] = False
    delta = normalize_delta(
        spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, deleted boolean",
        )
    )
    merged = merge_documents(docs, delta)
    m_path = os.path.join(tmp_root, "cg_delta_docs_v1")
    merged.write.mode("overwrite").parquet(m_path)
    merged = spark.read.parquet(m_path)
    fresh, tombs = changed_and_deleted(docs, merged)
    apply_index_delta(spark, idx_dir, merged, fresh, tombs)

    rb_dir = os.path.join(tmp_root, "cg_delta_rebuild")
    IndexBuilder(spark, rb_dir).build(
        merged, resume=False, num_partitions=2, common_gram_terms=cg
    )
    ds = DeltaSearcher(spark, idx_dir)
    rs = IndexSearcher(spark, rb_dir)
    assert ds.common_grams() == frozenset(cg)
    got = phrase_match_ids(ds, "w00000 w00001")
    want = phrase_match_ids(rs, "w00000 w00001")
    assert list(got) == list(want)
    new_id = merged.agg(F.max("doc_id")).collect()[0][0]
    assert new_id in set(got)  # the fresh doc's bigram posting is served

    # compaction must carry the analyzer chain: the folded index keeps the
    # common-grams marker and answers the bigram phrase identically
    from harvester_spark.streaming.compaction import compact_in_place

    compact_in_place(spark, idx_dir, merged, num_partitions=2)
    cs = IndexSearcher(spark, idx_dir)
    assert cs.common_grams() == frozenset(cg)
    assert list(phrase_match_ids(cs, "w00000 w00001")) == list(want)


def test_batch_serving_over_uncompacted_deltas(spark, tmp_root):
    """The distributed batch paths merge seq-tagged base+delta blocks
    EXECUTOR-side (latest-wins tombstones): over the stacked un-compacted
    index they must equal the rebuilt index bit-for-bit — including the
    update-then-update and update-then-delete docs — with exact totals.
    A plain IndexSearcher on the delta'd dir is refused (stale df/stats)."""
    from harvester_spark.search.distributed import (
        and_search_batch,
        or_search_batch,
        phrase_search_batch,
    )
    from harvester_spark.streaming.incremental import DeltaSearcher

    inc_dir = os.path.join(tmp_root, "stacked_index")
    rb_dir = os.path.join(tmp_root, "stacked_rebuild")
    if not os.path.exists(inc_dir):  # depends on the stacked fixture test
        pytest.skip("stacked fixture not built")
    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, rb_dir)

    # a plain IndexSearcher now refuses the delta'd dir at construction
    with pytest.raises(ValueError, match="DeltaSearcher"):
        IndexSearcher(spark, inc_dir)

    or_qs = [("q1", "charlie stacked"), ("q2", "w00000 bravo"),
             ("q3", "term_7 rewrite")]
    for strat in ["auto", "wand", "accumulate"]:
        got = or_search_batch(spark, ds, or_qs, k=10, n_ranges=3, strategy=strat)
        want = or_search_batch(spark, rs, or_qs, k=10, n_ranges=3, strategy=strat)
        for qid, _ in or_qs:
            a = got[got["query_id"] == qid].reset_index(drop=True)
            b = want[want["query_id"] == qid].reset_index(drop=True)
            assert list(a["doc_id"]) == list(b["doc_id"]), (qid, strat)
            assert (
                np.asarray(a["score"], np.float64)
                == np.asarray(b["score"], np.float64)
            ).all(), (qid, strat)

    and_qs = [("q1", "w00000 w00001"), ("q2", "charlie stacked")]
    got, tot = and_search_batch(spark, ds, and_qs, k=10, n_ranges=3)
    want, wtot = and_search_batch(spark, rs, and_qs, k=10, n_ranges=3)
    assert tot == wtot
    for qid, _ in and_qs:
        a = got[got["query_id"] == qid].reset_index(drop=True)
        b = want[want["query_id"] == qid].reset_index(drop=True)
        assert list(a["doc_id"]) == list(b["doc_id"]), qid
        assert (
            np.asarray(a["score"], np.float64)
            == np.asarray(b["score"], np.float64)
        ).all(), qid

    # phrases: 'rewrite alpha' was superseded in delta-2 → empty on BOTH
    ph_qs = [("q1", "charlie stacked", 0), ("q2", "stacked rewrite", 0),
             ("q3", "rewrite alpha", 0), ("q4", "w00000 w00001", 1)]
    got, tot = phrase_search_batch(spark, ds, ph_qs, k=10, n_ranges=3)
    want, wtot = phrase_search_batch(spark, rs, ph_qs, k=10, n_ranges=3)
    assert tot == wtot
    assert tot["q3"] == 0
    for qid, _t, _s in ph_qs:
        a = got[got["query_id"] == qid].reset_index(drop=True)
        b = want[want["query_id"] == qid].reset_index(drop=True)
        assert list(a["doc_id"]) == list(b["doc_id"]), qid
        assert (
            np.asarray(a["score"], np.float64)
            == np.asarray(b["score"], np.float64)
        ).all(), qid

    # and the delta-aware driver phrase path agrees with the batch result
    from harvester_spark.search.phrase import positional_phrase_search

    exp = positional_phrase_search(ds, "charlie stacked", k=10)
    sub = got[got["query_id"] == "q1"].reset_index(drop=True)
    assert list(sub["doc_id"]) == list(exp.topk["doc_id"])
    assert tot["q1"] == exp.results_total


def test_fuzz_batch_over_random_stacked_deltas(spark, tmp_root):
    """Randomized (seeded) workload: three stacked deltas with overlapping
    updates, inserts, and deletes of the same srns, then EVERY serving
    surface — driver search, batch OR (both strategies), batch AND, batch
    phrase — compared between the un-compacted DeltaSearcher and a full
    rebuild. Guards the executor-side seq-tagged merge against shapes the
    hand-written stacked test doesn't reach."""
    import pandas as pd
    import shutil

    from harvester_spark.search.distributed import (
        and_search_batch,
        or_search_batch,
        phrase_search_batch,
    )
    from harvester_spark.streaming.incremental import DeltaSearcher

    rng = np.random.default_rng(1234)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "w00000", "w00001", "w00002", "term_7"]

    out = os.path.join(tmp_root, "fuzzdelta")
    run_build(spark, out, n_docs=120, resume=False, num_partitions=4)
    docs = spark.read.parquet(f"{out}/documents")
    inc_dir = os.path.join(tmp_root, "fuzzdelta_index")
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc_dir)

    def rand_html():
        n = int(rng.integers(6, 20))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        return ("<p>" + " ".join(words) + "</p>").encode()

    phrases = []
    last_delta_pdf = None
    for step in range(3):
        ixs = sorted(set(rng.integers(0, 120, 8).tolist()) | {10_050 + step})
        pdf = corpus_pdf(np.array(ixs))
        # per-step ascending push versions (the version guard drops stale)
        pdf["warc_ts"] = pdf["warc_ts"] + pd.Timedelta(days=step + 1)
        htmls, dels = [], []
        for _ in ixs:
            h = rand_html()
            htmls.append(h)
            dels.append(bool(rng.random() < 0.25))
            toks = h.decode().replace("<p>", "").replace("</p>", "").split()
            if len(toks) >= 2:
                j = int(rng.integers(0, len(toks) - 1))
                phrases.append(" ".join(toks[j:j + 2]))
        pdf["html"] = htmls
        pdf["deleted"] = dels
        # adversarial extras: (a) DUPLICATE pushes of some urls inside the
        # batch, 12h newer with different content — in-batch latest-wins
        # must keep these; (b) STALE rows 400 days older than any base —
        # the version guard must drop them without producing re-index work
        extras = []
        for row_ix in rng.choice(len(pdf), size=min(3, len(pdf)), replace=False):
            dup = pdf.iloc[[int(row_ix)]].copy()
            dup["warc_ts"] = dup["warc_ts"] + pd.Timedelta(hours=12)
            dup["html"] = [rand_html()]
            dup["deleted"] = False
            extras.append(dup)
        stale_ix = sorted(set(rng.integers(0, 120, 3).tolist()) - set(ixs))
        if stale_ix:
            st = corpus_pdf(np.array(stale_ix))
            st["warc_ts"] = st["warc_ts"] - pd.Timedelta(days=400)
            st["html"] = [rand_html() for _ in stale_ix]
            st["deleted"] = [bool(rng.random() < 0.5) for _ in stale_ix]
            extras.append(st)
        pdf = pd.concat([pdf] + extras, ignore_index=True)
        delta = spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, deleted boolean",
        )
        last_delta_pdf = pdf
        merged = merge_documents(docs, normalize_delta(delta))
        mp = os.path.join(tmp_root, f"fuzzdelta_docs_v{step}")
        merged.write.mode("overwrite").parquet(mp)
        merged = spark.read.parquet(mp)
        fresh, tomb = changed_and_deleted(docs, merged)
        apply_index_delta(
            spark, inc_dir, merged, fresh, tomb, delta_name=f"delta-{step}"
        )
        docs = merged

    # at-least-once REDELIVERY of the last batch against the post-merge
    # base: every row is now same-hash or stale → a true no-op batch that
    # must write nothing and consume no delta seq
    from harvester_spark.search.engine import read_delta_state

    redelivered = spark.createDataFrame(
        last_delta_pdf,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, deleted boolean",
    )
    re_merged = merge_documents(docs, normalize_delta(redelivered))
    rmp = os.path.join(tmp_root, "fuzzdelta_docs_redeliver")
    re_merged.write.mode("overwrite").parquet(rmp)
    re_merged = spark.read.parquet(rmp)
    fresh, tomb = changed_and_deleted(docs, re_merged)
    assert fresh.count() == 0 and tomb.count() == 0
    apply_index_delta(spark, inc_dir, re_merged, fresh, tomb, delta_name="delta-3")
    assert len(read_delta_state(inc_dir)["deltas"]) == 3
    docs = re_merged

    rb_dir = os.path.join(tmp_root, "fuzzdelta_rebuild")
    IndexBuilder(spark, rb_dir).build(docs, resume=False, num_partitions=4)
    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, rb_dir)

    def rand_query(n_terms):
        return " ".join(
            vocab[int(i)] for i in rng.integers(0, len(vocab), n_terms)
        )

    or_qs = [(f"q{i}", rand_query(int(rng.integers(1, 4)))) for i in range(12)]
    for strat in ["wand", "accumulate"]:
        got = or_search_batch(spark, ds, or_qs, k=15, n_ranges=3, strategy=strat)
        want = or_search_batch(spark, rs, or_qs, k=15, n_ranges=3, strategy=strat)
        for qid, qtext in or_qs:
            a = got[got["query_id"] == qid].reset_index(drop=True)
            b = want[want["query_id"] == qid].reset_index(drop=True)
            assert list(a["doc_id"]) == list(b["doc_id"]), (strat, qtext)
            assert (
                np.asarray(a["score"], np.float64)
                == np.asarray(b["score"], np.float64)
            ).all(), (strat, qtext)

    and_qs = [(f"a{i}", rand_query(2)) for i in range(8)]
    got, tot = and_search_batch(spark, ds, and_qs, k=15, n_ranges=3)
    want, wtot = and_search_batch(spark, rs, and_qs, k=15, n_ranges=3)
    assert tot == wtot
    for qid, qtext in and_qs:
        a = got[got["query_id"] == qid].reset_index(drop=True)
        b = want[want["query_id"] == qid].reset_index(drop=True)
        assert list(a["doc_id"]) == list(b["doc_id"]), qtext
        assert (
            np.asarray(a["score"], np.float64)
            == np.asarray(b["score"], np.float64)
        ).all(), qtext

    ph_sample = [phrases[int(i)] for i in rng.integers(0, len(phrases), 10)]
    ph_qs = [(f"p{i}", p, 0) for i, p in enumerate(ph_sample)]
    got, tot = phrase_search_batch(spark, ds, ph_qs, k=15, n_ranges=3)
    want, wtot = phrase_search_batch(spark, rs, ph_qs, k=15, n_ranges=3)
    assert tot == wtot
    for qid, qtext, _ in ph_qs:
        a = got[got["query_id"] == qid].reset_index(drop=True)
        b = want[want["query_id"] == qid].reset_index(drop=True)
        assert list(a["doc_id"]) == list(b["doc_id"]), qtext
        assert (
            np.asarray(a["score"], np.float64)
            == np.asarray(b["score"], np.float64)
        ).all(), qtext

    # driver paths agree too (same merged truth through a different path)
    for _qid, qtext in or_qs[:4]:
        a = ds.search(qtext, k=15).topk
        b = rs.search(qtext, k=15).topk
        assert list(a["doc_id"]) == list(b["doc_id"]), qtext


def test_search_api_auto_delta_searcher(spark, tmp_root):
    """SearchAPI over an index dir with un-compacted deltas must serve
    post-delta truth transparently (auto DeltaSearcher), equal to an API
    over the rebuild."""
    from harvester_spark.search.api import SearchAPI
    from harvester_spark.streaming.incremental import DeltaSearcher

    inc_dir = os.path.join(tmp_root, "stacked_index")
    rb_dir = os.path.join(tmp_root, "stacked_rebuild")
    docs_path = os.path.join(tmp_root, "stacked_docs_v2")
    if not os.path.exists(inc_dir):  # depends on the stacked fixture test
        pytest.skip("stacked fixture not built")
    docs = spark.read.parquet(docs_path)
    api_d = SearchAPI(spark, inc_dir, docs)
    assert isinstance(api_d.searcher, DeltaSearcher)
    api_r = SearchAPI(spark, rb_dir, docs)
    for q in ["charlie stacked", "w00000 w00001", "stacked"]:
        a = api_d.search(q, k=10)
        b = api_r.search(q, k=10)
        assert a["results_total"] == b["results_total"], q
        assert [r["doc_id"] for r in a["results"]] == [
            r["doc_id"] for r in b["results"]
        ], q
    # batch MLT over the delta'd API equals the rebuild's
    seeds = [0, 3]
    ga = api_d.more_like_this_batch(seeds, k=5, n_ranges=3)
    gb = api_r.more_like_this_batch(seeds, k=5, n_ranges=3)
    assert list(ga["doc_id"]) == list(gb["doc_id"])
    assert (
        np.asarray(ga["score"], np.float64) == np.asarray(gb["score"], np.float64)
    ).all()


def test_in_batch_duplicate_pushes_latest_wins(spark, tmp_root):
    """A url pushed more than once inside ONE micro-batch must collapse to
    one row per srn before the merge (the full-outer MERGE would otherwise
    fan out into duplicate srn/doc_id rows): newest warc_ts wins for
    updates AND inserts; insert-then-delete in one batch yields one
    soft-deleted row. Regression for the pre-dedup in normalize_delta."""
    import pandas as pd

    from harvester_spark.corpus import EPOCH, doc_url
    from harvester_spark.pipeline import build_documents

    base = build_documents(generate_corpus(spark, 20, 2), 2)
    p = os.path.join(tmp_root, "duppush_docs")
    base.write.mode("overwrite").parquet(p)
    base = spark.read.parquet(p)
    real_url = base.filter(F.col("doc_id") == 3).select("url").first()["url"]

    pdf = pd.DataFrame(
        {
            "url": [real_url, real_url, doc_url(999), doc_url(999),
                    doc_url(998), doc_url(998)],
            # pushes must be NEWER than the base doc's warc_ts (version
            # guard: stale replays are dropped) — days, not seconds
            "warc_ts": [EPOCH + np.timedelta64(s, "D")
                        for s in (1000, 2000, 50, 60, 70, 80)],
            "html": [b"<p>first push</p>", b"<p>second push wins</p>",
                     b"<p>fresh v1</p>", b"<p>fresh v2 wins</p>",
                     b"<p>born</p>", b"<p>and deleted</p>"],
            "lang": ["en"] * 6,
            "deleted": [False, False, False, False, False, True],
        }
    )
    delta = normalize_delta(spark.createDataFrame(pdf))
    # one row per srn survives the in-batch dedup
    assert delta.count() == 3
    merged = merge_documents(base, delta)
    assert merged.count() == 22  # 20 base + 2 inserts
    assert merged.groupBy("srn").count().filter("count > 1").count() == 0
    assert merged.groupBy("doc_id").count().filter("count > 1").count() == 0
    rows = {
        r["url"]: (r["text"], r["state"])
        for r in merged.filter(
            F.col("url").isin([real_url, doc_url(999), doc_url(998)])
        ).collect()
    }
    assert rows[real_url] == ("second push wins", "active")
    assert rows[doc_url(999)] == ("fresh v2 wins", "active")
    assert rows[doc_url(998)][1] == "deleted"


def test_noop_and_pure_delete_batches(spark, tmp_root):
    """A NO-OP batch (redelivered pushes whose content matches base — routine
    under at-least-once delivery) must write nothing and consume no seq; a
    PURE-DELETE batch records tombstones + stats but no postings dir (an
    empty partitioned parquet write has no footers and bricked every later
    DeltaSearcher). Both stacked with an update must stay rebuild-identical,
    on the driver path and the distributed batch path."""
    from harvester_spark.search.distributed import or_search_batch
    from harvester_spark.search.engine import read_delta_state
    from harvester_spark.search.wand import or_search
    from harvester_spark.streaming.incremental import DeltaSearcher

    work = os.path.join(tmp_root, "noop_del")
    run_build(spark, work, n_docs=30, resume=False, num_partitions=4)
    docs = spark.read.parquet(f"{work}/documents")

    def push(docs, pdf, name):
        delta = normalize_delta(
            spark.createDataFrame(
                pdf,
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string, deleted boolean",
            )
        )
        merged = merge_documents(docs, delta)
        merged.write.mode("overwrite").parquet(f"{work}/docs_{name}")
        merged = spark.read.parquet(f"{work}/docs_{name}")
        fresh, tombs = changed_and_deleted(docs, merged)
        apply_index_delta(
            spark, f"{work}/index", merged, fresh, tombs, delta_name=name
        )
        return merged

    pdf = corpus_pdf(np.array([2, 7]))  # identical content → no-op
    pdf["deleted"] = False
    docs = push(docs, pdf, "noop")
    pdf = corpus_pdf(np.array([5]))  # pure delete
    pdf["deleted"] = True
    docs = push(docs, pdf, "del-only")
    pdf = corpus_pdf(np.array([9]))  # real update
    pdf["html"] = [b"<p>rewritten nine zulu</p>"]
    pdf["deleted"] = False
    docs = push(docs, pdf, "upd")

    state = read_delta_state(f"{work}/index")
    assert [d["name"] for d in state["deltas"]] == ["del-only", "upd"]
    assert [d["has_postings"] for d in state["deltas"]] == [False, True]

    s = DeltaSearcher(spark, f"{work}/index")
    assert 5 not in set(s.search("the", k=100).topk["doc_id"])

    rb = os.path.join(work, "rebuild")
    IndexBuilder(spark, f"{rb}/index").build(docs, resume=False, num_partitions=4)
    s2 = IndexSearcher(spark, f"{rb}/index")
    for q in ["zulu", "the", "customer part"]:
        a, b = s.search(q, k=20), s2.search(q, k=20)
        assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), q
        assert (a.topk["score"].to_numpy() == b.topk["score"].to_numpy()).all(), q
        assert a.results_total == b.results_total, q

    got = or_search_batch(
        spark, s, [("q1", "zulu"), ("q2", "customer part")], k=10, n_ranges=3
    )
    for qid, q in [("q1", "zulu"), ("q2", "customer part")]:
        exp = or_search(s, q, k=10)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == list(exp["doc_id"]), q


def test_reapplied_delta_is_idempotent(spark, tmp_root):
    """foreachBatch retries a crashed batch with the same batch id, so
    apply_index_delta must be idempotent per delta_name: the re-apply keeps
    the existing seq, REPLACES the manifest entry (never a duplicate name
    with a fresh seq), and stages under a fresh attempt dir so readers of
    the live manifest never see a dir being overwritten."""
    import pandas as pd

    from harvester_spark.search.engine import read_delta_state
    from harvester_spark.streaming.incremental import DeltaSearcher

    work = os.path.join(tmp_root, "retry_idem")
    run_build(spark, work, n_docs=30, resume=False, num_partitions=4)
    docs = spark.read.parquet(f"{work}/documents")
    pdf = corpus_pdf(np.array([9]))
    pdf["html"] = [b"<p>rewritten nine zulu</p>"]
    pdf["deleted"] = False
    delta = normalize_delta(
        spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, deleted boolean",
        )
    )
    merged = merge_documents(docs, delta)
    merged.write.mode("overwrite").parquet(f"{work}/docs_v2")
    merged = spark.read.parquet(f"{work}/docs_v2")
    fresh, tombs = changed_and_deleted(docs, merged)
    apply_index_delta(spark, f"{work}/index", merged, fresh, tombs, delta_name="delta-0")
    st1 = read_delta_state(f"{work}/index")
    apply_index_delta(spark, f"{work}/index", merged, fresh, tombs, delta_name="delta-0")
    st2 = read_delta_state(f"{work}/index")
    assert len(st2["deltas"]) == 1 and st2["seq"] == 1
    (e1,), (e2,) = st1["deltas"], st2["deltas"]
    assert (e2["name"], e2["seq"]) == (e1["name"], e1["seq"]) == ("delta-0", 1)
    # the re-apply staged FRESH dirs; the previously-published ones survive
    # untouched for readers of the old manifest
    assert e2["dir"] != e1["dir"]
    assert st2["stats_dir"] != st1["stats_dir"]
    assert os.path.isdir(f"{work}/index/postings_delta/delta={e1['dir']}")
    assert os.path.isdir(f"{work}/index/{st1['stats_dir']}")
    s = DeltaSearcher(spark, f"{work}/index")
    assert s.search("zulu", k=5).results_total == 1


def test_suggestions_see_delta_only_terms(spark, tmp_root):
    """autocomplete and did_you_mean must surface vocabulary that first
    arrived in an un-compacted delta (webhook-ingested docs), with
    post-delta df — not wait for compaction. Deleted-in-delta terms must
    NOT suggest."""
    import pandas as pd

    from harvester_spark.corpus import EPOCH, doc_url
    from harvester_spark.search.api import SearchAPI
    from harvester_spark.streaming.incremental import DeltaSearcher

    work = os.path.join(tmp_root, "sugg_delta")
    run_build(spark, work, n_docs=30, resume=False, num_partitions=4)
    docs = spark.read.parquet(f"{work}/documents")
    pdf = pd.DataFrame(
        {
            "url": [doc_url(777), doc_url(778)],
            "warc_ts": [EPOCH + np.timedelta64(s, "s") for s in (10, 20)],
            "html": [b"<p>xylophonic xylograph melody</p>", b"<p>xylophonic reprise</p>"],
            "text": ["xylophonic xylograph melody", "xylophonic reprise"],
            "lang": ["en"] * 2,
            "deleted": [False, False],
        }
    )
    delta = normalize_delta(
        spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, deleted boolean",
        )
    )
    merged = merge_documents(docs, delta)
    merged.write.mode("overwrite").parquet(f"{work}/docs_v2")
    merged = spark.read.parquet(f"{work}/docs_v2")
    fresh, tombs = changed_and_deleted(docs, merged)
    apply_index_delta(spark, f"{work}/index", merged, fresh, tombs, delta_name="d0")

    api = SearchAPI(spark, f"{work}/index", merged)
    assert isinstance(api.searcher, DeltaSearcher)
    comp = api.autocomplete("xylo", 5)
    assert "xylophonic" in comp and "xylograph" in comp
    # df is post-delta: the term in both pushed docs outranks the singleton
    assert comp.index("xylophonic") < comp.index("xylograph")
    dym = api.did_you_mean("xylophonik")
    assert dym is not None and dym["suggestion"] == "xylophonic"


def test_webhook_stream_multi_batch(spark, tmp_root):
    """Three sequential micro-batches through the REAL streaming engine
    (maxFilesPerTrigger=1): insert, update+delete, and a redelivered
    duplicate of batch 2 (at-least-once no-op). End state must equal a
    rebuild over the final documents, and the no-op batch must not consume
    a delta seq."""
    import shutil

    from harvester_spark.search.engine import read_delta_state
    from harvester_spark.streaming.incremental import DeltaSearcher
    from harvester_spark.streaming.webhook import start_webhook_stream

    root = os.path.join(tmp_root, "webhook_multi")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=40, resume=False, num_partitions=2)

    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    base = spark.read.parquet(f"{out}/documents")
    victim = base.filter(F.col("doc_id") == 7).first()

    drop = os.path.join(root, "drop")
    os.makedirs(drop, exist_ok=True)
    batches = [
        [{"url": "https://example.org/alpha/88888888",
          "warc_ts": "2024-01-01T00:00:00.000Z",
          "html": "<p>streamed quokka document</p>", "lang": "en",
          "deleted": False}],
        [{"url": "https://example.org/alpha/88888888",
          "warc_ts": "2024-01-02T00:00:00.000Z",
          "html": "<p>streamed quokka document revised wombat</p>",
          "lang": "en", "deleted": False},
         {"url": victim["url"], "warc_ts": "2024-01-02T00:00:00.000Z",
          "html": "<p>x</p>", "lang": "en", "deleted": True}],
    ]
    # batch 3 = exact redelivery of batch 2 (at-least-once)
    batches.append(batches[1])
    import time

    now = time.time()
    for i, rows in enumerate(batches):
        path = os.path.join(drop, f"b{i}.json")
        with open(path, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        # the file source orders batches by mtime — stagger them so the
        # three micro-batches process deterministically in drop order
        os.utime(path, (now - 30 + 10 * i, now - 30 + 10 * i))

    q = start_webhook_stream(
        spark, drop, catalog, index_dir, os.path.join(root, "ckpt"),
        available_now=True, max_files_per_trigger=1,
    )
    q.awaitTermination(240)

    docs = catalog.read_documents(spark)
    pushed = docs.filter(F.col("url").endswith("88888888")).collect()
    assert len(pushed) == 1 and "wombat" in pushed[0]["text"]
    assert docs.filter(F.col("doc_id") == 7).first()["state"] == "deleted"

    state = read_delta_state(index_dir)
    # batch 1 and 2 each produced a delta; the redelivered batch 3 no-op'd
    assert len(state["deltas"]) == 2

    ds = DeltaSearcher(spark, index_dir)
    rb = os.path.join(root, "rebuild")
    IndexBuilder(spark, f"{rb}/index").build(docs, resume=False, num_partitions=2)
    rs = IndexSearcher(spark, f"{rb}/index")
    for query in ["wombat", "quokka revised", "the", "w00000 w00001"]:
        a, b = ds.search(query, k=20), rs.search(query, k=20)
        assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), query
        assert (a.topk["score"].to_numpy() == b.topk["score"].to_numpy()).all(), query
        assert a.results_total == b.results_total, query


def test_stale_replay_does_not_regress(spark, tmp_root):
    """A replayed push whose warc_ts is OLDER than the base row (redelivered
    early batch, out-of-order file listing) must not regress the doc:
    updates and deletes apply only when the delta's warc_ts >= base's."""
    import pandas as pd

    from harvester_spark.pipeline import build_documents

    base = build_documents(generate_corpus(spark, 20, 2), 2)
    p = os.path.join(tmp_root, "stale_docs")
    base.write.mode("overwrite").parquet(p)
    base = spark.read.parquet(p)
    import datetime

    row = base.filter(F.col("doc_id") == 3).first()
    stale_ts = row["warc_ts"] - datetime.timedelta(days=1)

    pdf = pd.DataFrame(
        {
            "url": [row["url"], row["url"]],
            "warc_ts": [stale_ts, stale_ts],
            "html": [b"<p>stale regression</p>", b"<p>x</p>"],
            "text": ["stale regression", "x"],
            "lang": ["en", "en"],
            "deleted": [False, True],
        }
    )
    # two separate single-row batches: stale update, then stale delete
    for i in range(2):
        delta = normalize_delta(
            spark.createDataFrame(
                pdf.iloc[[i]],
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string, deleted boolean",
            )
        )
        merged = merge_documents(base, delta)
        after = merged.filter(F.col("doc_id") == 3).first()
        assert after["text"] == row["text"]
        assert after["state"] == "active"
        assert after["content_hash"] == row["content_hash"]
        fresh, tombs = changed_and_deleted(base, merged)
        assert fresh.count() == 0 and tombs.count() == 0


def test_mlt_surfaces_delta_docs(spark, tmp_root):
    """more_like_this over an un-compacted delta must rank delta-inserted
    docs that share the seed's vocabulary (single-seed and batch paths),
    and tolerate a missing seed id in the batch."""
    import pandas as pd

    from harvester_spark.corpus import EPOCH, doc_url
    from harvester_spark.search.api import SearchAPI

    work = os.path.join(tmp_root, "mlt_delta")
    run_build(spark, work, n_docs=50, resume=False, num_partitions=4)
    docs = spark.read.parquet(f"{work}/documents")
    base_text = docs.filter(F.col("doc_id") == 4).first()["text"]
    words = base_text.split()[:30]
    pdf = pd.DataFrame(
        {
            "url": [doc_url(991), doc_url(992)],
            "warc_ts": [EPOCH + np.timedelta64(9000, "D")] * 2,
            "html": [
                f"<p>{' '.join(words)}</p>".encode(),
                f"<p>{' '.join(words[:15])} unrelated filler</p>".encode(),
            ],
            "lang": ["en"] * 2,
            "deleted": [False] * 2,
        }
    )
    delta = normalize_delta(
        spark.createDataFrame(
            pdf,
            "url string, warc_ts timestamp, html binary, lang string, "
            "deleted boolean",
        )
    )
    merged = merge_documents(docs, delta)
    merged.write.mode("overwrite").parquet(f"{work}/docs_v2")
    merged = spark.read.parquet(f"{work}/docs_v2")
    fresh, tombs = changed_and_deleted(docs, merged)
    apply_index_delta(spark, f"{work}/index", merged, fresh, tombs, delta_name="d0")

    api = SearchAPI(spark, f"{work}/index", merged)
    delta_ids = {
        r["doc_id"]
        for r in merged.filter(F.col("url").rlike("99[12]$")).collect()
    }
    single = api.more_like_this(4, k=5)
    top = list(single["doc_id"])
    assert delta_ids <= set(top)
    batch = api.more_like_this_batch([4, 10**9], k=5)
    sub = batch[batch["seed_doc_id"] == 4] if "seed_doc_id" in batch.columns else batch
    assert delta_ids <= set(sub["doc_id"])


def test_merged_cache_eviction_keeps_current_terms(incr, spark, tmp_root):
    """Regression (advisor, round 2): a cache clear triggered while merging
    must not drop entries the SAME call still returns — a long-lived
    DeltaSearcher whose query straddled the 4096/1024-entry eviction raised
    KeyError on the first term cached before the clear."""
    import shutil

    from harvester_spark.streaming.incremental import DeltaSearcher

    out, base, delta, merged = incr
    d_fresh, d_tombs = changed_and_deleted(base, merged)
    inc_dir = os.path.join(tmp_root, "evict_index")
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc_dir)
    apply_index_delta(spark, inc_dir, merged, d_fresh, d_tombs, delta_name="d0")
    ds = DeltaSearcher(spark, inc_dir)
    fresh = DeltaSearcher(spark, inc_dir)

    # Warm one term, then stuff the cache past the threshold so the next
    # fresh merge fires the eviction mid-call.
    ds._merged_term_arrays(["w00000"], "all")
    for i in range(4097):
        ds._merged_cache[(f"__junk{i}__", "all")] = (
            np.array([0], dtype=np.int64),
            np.array([1], dtype=np.int64),
        )
    got = ds._merged_term_arrays(["w00000", "completely"], "all")
    want = fresh._merged_term_arrays(["w00000", "completely"], "all")
    for t in ("w00000", "completely"):
        assert np.array_equal(got[t][0], want[t][0]), t
        assert np.array_equal(got[t][1], want[t][1]), t
    assert len(got["completely"][0]) > 0  # the delta term really merged

    # positional twin (1024-entry threshold)
    if ds.has_positions:
        ds._pos_cache.clear()
        ds._merged_term_positional(["w00000"], "all")
        for i in range(1025):
            ds._pos_cache[(f"__junk{i}__", "all")] = (
                np.array([0]), np.array([1]), np.array([0]), np.array([0]),
            )
        gp = ds._merged_term_positional(["w00000", "completely"], "all")
        wp = fresh._merged_term_positional(["w00000", "completely"], "all")
        for t in ("w00000", "completely"):
            for a, b in zip(gp[t], wp[t]):
                assert np.array_equal(np.asarray(a), np.asarray(b)), t


def test_nonresume_rebuild_clears_stale_delta_artifacts(incr, spark, tmp_root):
    """Regression (advisor, round 2): build(resume=False) into a dir that
    served deltas must remove delta_state.json / postings_delta / tombstones
    / stats / the doc_lens sidecar — otherwise a new SearchAPI would open
    DeltaSearcher and merge STALE delta postings over the fresh base."""
    import shutil

    from harvester_spark.streaming.incremental import DeltaSearcher

    out, base, delta, merged = incr
    fresh, tombstones = changed_and_deleted(base, merged)
    dirty = os.path.join(tmp_root, "dirty_rebuild")
    shutil.rmtree(dirty, ignore_errors=True)
    shutil.copytree(f"{out}/index", dirty)
    apply_index_delta(spark, dirty, merged, fresh, tombstones, delta_name="d0")
    assert os.path.exists(os.path.join(dirty, "delta_state.json"))
    DeltaSearcher(spark, dirty).search("completely", k=5)  # builds sidecars
    np.save(os.path.join(dirty, "doc_lens.f8.npy"), np.zeros(3))  # stale base sidecar

    IndexBuilder(spark, dirty).build(merged, resume=False, num_partitions=4)
    for stale in ("delta_state.json", "postings_delta", "tombstones", "stats",
                  "doc_lens.f8.npy"):
        assert not os.path.exists(os.path.join(dirty, stale)), stale

    # plain IndexSearcher opens (no un-compacted-delta guard) and matches a
    # from-scratch rebuild exactly
    clean = os.path.join(tmp_root, "clean_rebuild")
    IndexBuilder(spark, clean).build(merged, resume=False, num_partitions=4)
    a = IndexSearcher(spark, dirty).search("completely", k=10).topk
    b = IndexSearcher(spark, clean).search("completely", k=10).topk
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])


def test_webhook_batches_do_not_accumulate_cached_frames(spark, tmp_root):
    """Regression (advisor, round 2): one cached DataFrame per micro-batch
    leaked forever in a long-running stream. After N batches the persistent
    RDD registry must be back at its pre-stream size."""
    import shutil
    from datetime import datetime, timedelta

    from harvester_spark.streaming.webhook import process_webhook_batch

    root = os.path.join(tmp_root, "webhook_nocache")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=40, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    t0 = datetime(2024, 1, 1)
    for bid in range(3):
        bdf = spark.createDataFrame(
            [(f"https://example.org/push/{bid:08d}", t0 + timedelta(days=bid),
              f"<p>pushed doc number {bid} unique zebra{bid}</p>", "en", False)],
            "url string, warc_ts timestamp, html string, lang string, deleted boolean",
        )
        process_webhook_batch(spark, bdf, bid, catalog, index_dir)
    assert n_persistent() <= before, (before, n_persistent())


def test_streaming_auto_compaction(spark, tmp_root):
    """Round-3: the ingest loop's compaction policy fires mid-stream
    (delta count >= threshold) and serving stays identical to a fresh
    rebuild BEFORE the trigger (delta chain), ON the triggering batch
    (compacted base), and AFTER it (new delta over the compacted base).
    Superseded document versions are GC'd (catalog expire)."""
    import shutil
    from datetime import datetime, timedelta

    from harvester_spark.search.engine import read_delta_state
    from harvester_spark.streaming.incremental import DeltaSearcher
    from harvester_spark.streaming.webhook import process_webhook_batch

    root = os.path.join(tmp_root, "autocompact")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=40, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    def assert_serves_like_rebuild(stage: str):
        docs = catalog.read_documents(spark)
        rb = os.path.join(root, f"rb_{stage}")
        IndexBuilder(spark, rb).build(docs, resume=False, num_partitions=2)
        rs = IndexSearcher(spark, rb)
        state = read_delta_state(index_dir)
        live = (
            DeltaSearcher(spark, index_dir)
            if state and state.get("deltas")
            else IndexSearcher(spark, index_dir)
        )
        for q in ["w00000", "w00000 w00001", "pushed zebra0", "zebra2"]:
            a, b = live.search(q, k=10), rs.search(q, k=10)
            assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), (stage, q)
            assert list(a.topk["score"]) == list(b.topk["score"]), (stage, q)
            assert a.results_total == b.results_total, (stage, q)

    t0 = datetime(2024, 2, 1)
    for bid in range(4):
        bdf = spark.createDataFrame(
            [(f"https://example.org/push/{bid:08d}", t0 + timedelta(days=bid),
              f"<p>pushed doc zebra{bid} body text</p>", "en", False)],
            "url string, warc_ts timestamp, html string, lang string, deleted boolean",
        )
        process_webhook_batch(
            spark, bdf, bid, catalog, index_dir,
            compact_max_deltas=2, keep_versions=2,
            # tiny pushes over a tiny base: keep the size-ratio trigger out
            # of the way so this loop pins the COUNT-triggered tier-merge
            compact_ratio=1e9,
        )
        state = read_delta_state(index_dir)
        n_deltas = len(state["deltas"]) if state else 0
        if bid == 0:
            assert n_deltas == 1, "before trigger: one live delta"
            assert_serves_like_rebuild("before")
        else:
            # count trigger ≥2 → tier-merge folds the chain into ONE delta
            # (the base index is never rewritten by a count trigger)
            assert n_deltas == 1, (bid, n_deltas)
            assert state["deltas"][0]["name"].startswith("merged-"), bid
            assert_serves_like_rebuild(f"merged_{bid}")
        # the documents side folded too: overlay chain stays ≤ 2 deep
        assert len(catalog.chain()) <= 3, catalog.chain()

    # ---- ratio trigger: one push comparable to the base corpus → FULL
    # fold (clean base index, postings_delta gone, documents materialized)
    big = spark.createDataFrame(
        [(f"https://example.org/push/{80000000 + i}", t0 + timedelta(days=30),
          f"<p>bulk pushed zebra{i} corpus expansion text body {i}</p>", "en",
          False)
         for i in range(60)],
        "url string, warc_ts timestamp, html string, lang string, deleted boolean",
    )
    process_webhook_batch(
        spark, big, 9, catalog, index_dir,
        compact_max_deltas=99, compact_ratio=0.5, keep_versions=2,
    )
    state = read_delta_state(index_dir)
    assert not (state and state.get("deltas")), "ratio trigger folds to base"
    assert not os.path.exists(os.path.join(index_dir, "postings_delta"))
    assert len(catalog.chain()) == 1, "documents materialized at full fold"
    assert_serves_like_rebuild("full_fold")
    assert len(catalog.versions()) <= 4  # keep=2 + live chain — GC'd


def test_recover_interrupted_compaction(tmp_root):
    """Crash between the two swap renames: the finished .compact build wins;
    with no finished build the .old dir is restored. Idempotent."""
    from harvester_spark.streaming.webhook import recover_interrupted_compaction

    root = os.path.join(tmp_root, "recover")
    idx = os.path.join(root, "index")
    # case 1: finished compact build present
    os.makedirs(os.path.join(idx + ".compact", "dictionary"))
    os.makedirs(idx + ".old")
    recover_interrupted_compaction(idx)
    assert os.path.isdir(os.path.join(idx, "dictionary"))
    recover_interrupted_compaction(idx)  # no-op when live dir exists
    assert os.path.isdir(idx)
    # case 2: only the old dir survives
    import shutil

    shutil.rmtree(idx)
    recover_interrupted_compaction(idx)  # .old restored
    assert os.path.isdir(idx)


def test_single_query_dispatch_over_uncompacted_deltas(incr, spark, tmp_root, monkeypatch):
    """The round-3 single-query dispatch must stay rank-identical over a
    DeltaSearcher with un-compacted deltas (ranges merge seq-tagged base ∪
    delta blocks with tombstone filtering) — compared against a full
    rebuild, both AND and OR."""
    import shutil

    from harvester_spark.search import phrase as phrase_mod, wand as wand_mod
    from harvester_spark.streaming.incremental import DeltaSearcher

    out, base, delta, merged = incr
    fresh, tombs = changed_and_deleted(base, merged)
    inc_dir = os.path.join(tmp_root, "dispatch_delta_idx")
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.copytree(f"{out}/index", inc_dir)
    apply_index_delta(spark, inc_dir, merged, fresh, tombs, delta_name="d0")
    rb_dir = os.path.join(tmp_root, "dispatch_delta_rb")
    IndexBuilder(spark, rb_dir).build(merged, resume=False, num_partitions=4)

    ds = DeltaSearcher(spark, inc_dir)
    rs = IndexSearcher(spark, rb_dir)
    monkeypatch.setattr(phrase_mod, "PHRASE_BATCH_MIN_DF", 0)
    monkeypatch.setattr(wand_mod, "OR_BATCH_MIN_SUM_DF", 0)
    for q in ["w00000 w00001", "completely alpha", "w00001 w00002"]:
        a, b = ds.search(q, k=10), rs.search(q, k=10)
        assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), q
        assert list(a.topk["score"]) == list(b.topk["score"]), q
        assert a.results_total == b.results_total, q
    for q in ["w00000 completely", "alpha w00001"]:
        got, gstats = wand_mod.or_search(ds, q, k=10, with_stats=True)
        want = wand_mod.or_search(rs, q, k=10, strategy="accumulate")
        # Round-5 carve-out: rare-driver + common-tail mixes route to
        # MAXSCORE (wand._maxscore_carveout) — label follows the
        # dispatch; rank identity asserted below either way.
        from harvester_spark.analysis import tokenize

        terms = sorted(set(tokenize(q)))
        dfs = ds._dfs(terms, wand_mod.ALL_LANG)
        live = [t for t in terms if dfs[t] > 0]
        expected = (
            "maxscore"
            if wand_mod._maxscore_carveout(dfs, live)
            else "batch"
        )
        assert gstats["strategy"] == expected, q
        assert list(got["doc_id"]) == list(want["doc_id"]), q
        assert list(got["score"]) == list(want["score"]), q


def test_did_you_mean_collation_over_deltas(spark, tmp_root):
    """Collation over a delta'd index: the present anchor term AND the
    collating candidate both arrive via a webhook delta — the candidate
    must collate through the merged (base ∪ delta) postings."""
    import shutil
    from datetime import datetime

    from harvester_spark.search.api import SearchAPI
    from harvester_spark.streaming.webhook import process_webhook_batch

    root = os.path.join(tmp_root, "dym_delta")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=30, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    bdf = spark.createDataFrame(
        [("https://example.org/push/90000001", datetime(2024, 3, 1),
          "<p>quokka zyx habitat island</p>", "en", False)],
        "url string, warc_ts timestamp, html string, lang string, deleted boolean",
    )
    process_webhook_batch(spark, bdf, 0, catalog, index_dir)

    docs = catalog.read_documents(spark)
    api = SearchAPI(spark, index_dir, docs)
    # 'quokka' (delta-only) is present; typo 'zyq' should collate to the
    # delta-only co-occurring 'zyx'
    r = api.did_you_mean("quokka zyq")
    assert r == {"original": "quokka zyq", "suggestion": "quokka zyx"}, r


def test_webhook_forwards_decompound_words(spark, tmp_root, monkeypatch):
    """Regression (round-3 review): process_webhook_batch accepted
    decompound_words but never forwarded them to apply_index_delta — a
    decompound-built index failed every micro-batch on the analyzer-marker
    guard despite the caller supplying the words."""
    import shutil
    from datetime import datetime

    from harvester_spark.streaming import webhook as wh

    root = os.path.join(tmp_root, "wh_decomp")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=20, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)

    seen = {}
    orig = wh.apply_index_delta

    def spy(*a, **k):
        seen["decompound_words"] = k.get("decompound_words")
        return orig(*a, **k)

    monkeypatch.setattr(wh, "apply_index_delta", spy)
    words = frozenset({"fiets", "band"})
    bdf = spark.createDataFrame(
        [("https://example.org/push/70000001", datetime(2024, 4, 1),
          "<p>english only payload here</p>", "en", False)],
        "url string, warc_ts timestamp, html string, lang string, deleted boolean",
    )
    wh.process_webhook_batch(
        spark, bdf, 0, catalog, index_dir, decompound_words=words
    )
    assert seen["decompound_words"] is words
