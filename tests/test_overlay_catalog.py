"""Overlay documents versions + patch-mode stats + tiered compaction
(round-5: O(batch) point-ingest instead of O(corpus) per micro-batch).

The round-4 webhook path rewrote the FULL documents version and the FULL
doc_stats table every micro-batch — write amplification that cannot exist
at the 100 TB design point. Round 5 replaces both with merge-on-read:

- documents versions are OVERLAYS (the batch's post-merge rows + a base
  pointer); readers resolve latest-wins per srn,
- index stats are exact int64 totals + per-delta patches in the manifest,
- the compaction policy is TIERED: count trigger → merge deltas/overlays
  into one (O(pushed docs)); size-ratio trigger → full fold into a clean
  base (O(corpus), amortized).

These tests pin the resolution semantics and the bit-identity of serving
against full rebuilds across every path.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.index.build import IndexBuilder
from harvester_spark.index.catalog import IndexCatalog
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher, read_delta_state
from harvester_spark.streaming.incremental import DeltaSearcher
from harvester_spark.streaming.webhook import process_webhook_batch

SCHEMA = "url string, warc_ts timestamp, html string, lang string, deleted boolean"
T0 = datetime(2024, 5, 1)


@pytest.fixture()
def rig(spark, tmp_root, request):
    """Base 60-doc corpus + catalog v000000 + live index dir."""
    root = os.path.join(tmp_root, f"overlay_{request.node.name[:40]}")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=60, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)
    return root, catalog, index_dir


def _push(spark, catalog, index_dir, bid, rows, **kw):
    bdf = spark.createDataFrame(
        [(u, T0 + timedelta(days=bid), h, lang, d) for (u, h, lang, d) in rows],
        SCHEMA,
    )
    kw.setdefault("compact_ratio", 1e9)  # policy pinned per-test
    kw.setdefault("compact_max_deltas", 99)
    process_webhook_batch(spark, bdf, bid, catalog, index_dir, **kw)


def test_overlay_version_is_batch_sized_and_resolves(spark, rig):
    root, catalog, index_dir = rig
    base_rows = catalog.read_documents(spark).count()
    _push(spark, catalog, index_dir, 0, [
        ("https://example.org/ov/90000001", "<p>overlay alpha doc</p>", "en", False),
        ("https://example.org/ov/90000002", "<p>overlay beta doc</p>", "en", False),
    ])
    cur = catalog.current()
    # the version dir holds ONLY the batch rows, not a corpus copy
    ov = spark.read.parquet(catalog.version_dir(cur))
    assert ov.count() == 2
    meta = catalog.version_meta(cur)
    assert meta["base"] == "v000000"
    # resolution: base + inserts
    resolved = catalog.read_documents(spark)
    assert resolved.count() == base_rows + 2
    # update one of the pushed docs: the newer overlay wins, row count flat
    _push(spark, catalog, index_dir, 1, [
        ("https://example.org/ov/90000001", "<p>overlay alpha REVISED doc</p>", "en", False),
    ])
    resolved = catalog.read_documents(spark)
    assert resolved.count() == base_rows + 2
    row = resolved.filter(F.col("url").endswith("90000001")).collect()[0]
    assert "revised" in row["text"].lower()
    # doc_id stable across the update
    first = spark.read.parquet(catalog.version_dir("v000001"))
    old_id = first.filter(F.col("url").endswith("90000001")).collect()[0]["doc_id"]
    assert row["doc_id"] == old_id
    # chain-aware expire never drops a live base
    catalog.expire(keep=1)
    assert "v000000" in catalog.versions()
    assert catalog.read_documents(spark).count() == base_rows + 2


def test_patch_stats_match_full_recompute_exactly(spark, rig):
    """Manifest totals (base_totals + Σ patches) == exact recompute from
    the resolved documents — counts AND int64 doc_len sums, per lang."""
    root, catalog, index_dir = rig
    _push(spark, catalog, index_dir, 0, [
        ("https://example.org/st/90000011", "<p>stats one two three</p>", "en", False),
        ("https://example.org/st/90000012", "<p>statistieken vier vijf</p>", "nl", False),
    ])
    _push(spark, catalog, index_dir, 1, [
        # update (new hash) + delete of a base doc via its url
        ("https://example.org/st/90000011", "<p>stats one two three four five six</p>",
         "en", False),
    ])
    state = read_delta_state(index_dir)
    assert state.get("base_totals") is not None
    assert all(d.get("stats_patch") for d in state["deltas"])
    from harvester_spark.search.engine import fold_totals

    folded = fold_totals(state)
    truth = (
        catalog.read_documents(spark)
        .filter(F.col("state") == "active")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_len").cast("long").alias("s"))
        .collect()
    )
    expect = {r["lang"]: (int(r["n"]), int(r["s"])) for r in truth}
    expect["all"] = (
        sum(v[0] for v in expect.values()),
        sum(v[1] for v in expect.values()),
    )
    assert folded == expect
    # the searcher's corpus stats and doc_len array agree with a rebuild's
    ds = DeltaSearcher(spark, index_dir)
    rb_dir = os.path.join(root, "rb_stats")
    IndexBuilder(spark, rb_dir).build(
        catalog.read_documents(spark), resume=False, num_partitions=2
    )
    rs = IndexSearcher(spark, rb_dir)
    assert ds._corpus_stats == rs._corpus_stats
    a, b = np.asarray(ds._doc_lens()), np.asarray(rs._doc_lens())
    n = min(len(a), len(b))
    assert (a[:n] == b[:n]).all() and not a[n:].any() and not b[n:].any()


def test_no_full_doc_stats_rewrite_per_batch(spark, rig):
    """The O(corpus) stats rewrite is gone: patch dirs are batch-sized and
    no stats/vNNNNNN full snapshot appears for patch-mode deltas."""
    root, catalog, index_dir = rig
    for bid in range(3):
        _push(spark, catalog, index_dir, bid, [
            (f"https://example.org/np/9000010{bid}", f"<p>nostats doc {bid}</p>", "en",
             False),
        ])
    state = read_delta_state(index_dir)
    assert state["stats_dir"] is None
    for d in state["deltas"]:
        patch = spark.read.parquet(os.path.join(index_dir, d["stats_patch"]))
        assert patch.count() <= 2  # upsert (+ removal on updates)
    stats_root = os.path.join(index_dir, "stats")
    if os.path.isdir(stats_root):
        assert not [p for p in os.listdir(stats_root) if p.startswith("v")]


def test_delta_serving_identity_through_merge_and_fold(spark, rig):
    """Bit-identical serving vs a fresh rebuild across: stacked patch
    deltas → tier-merge → more deltas → ratio-triggered full fold."""
    root, catalog, index_dir = rig

    def check(stage):
        docs = catalog.read_documents(spark)
        rb = os.path.join(root, f"rb_{stage}")
        shutil.rmtree(rb, ignore_errors=True)
        IndexBuilder(spark, rb).build(docs, resume=False, num_partitions=2)
        rs = IndexSearcher(spark, rb)
        state = read_delta_state(index_dir)
        live = (
            DeltaSearcher(spark, index_dir)
            if state and state.get("deltas")
            else IndexSearcher(spark, index_dir)
        )
        for q in ["w00000", "w00000 w00001", "ovmerge alpha", "w00002"]:
            a, b = live.search(q, k=15), rs.search(q, k=15)
            assert list(a.topk["doc_id"]) == list(b.topk["doc_id"]), (stage, q)
            assert list(a.topk["score"]) == list(b.topk["score"]), (stage, q)
            assert a.results_total == b.results_total, (stage, q)

    # three patch deltas: insert, update+insert, delete
    _push(spark, catalog, index_dir, 0, [
        ("https://example.org/tm/90000021", "<p>ovmerge alpha w00000 doc</p>", "en", False),
        ("https://example.org/tm/90000022", "<p>ovmerge beta w00001 doc</p>", "en", False),
    ])
    _push(spark, catalog, index_dir, 1, [
        ("https://example.org/tm/90000021", "<p>ovmerge alpha REV w00002 doc</p>", "en",
         False),
        ("https://example.org/tm/90000023", "<p>ovmerge gamma w00000 w00001</p>", "nl",
         False),
    ])
    _push(spark, catalog, index_dir, 2, [
        ("https://example.org/tm/90000022", "<p>x</p>", "en", True),  # delete
    ])
    check("stacked")
    # count trigger at the NEXT batch folds 4 deltas into one merged delta
    _push(spark, catalog, index_dir, 3, [
        ("https://example.org/tm/90000024", "<p>ovmerge delta w00003</p>", "en", False),
    ], compact_max_deltas=4)
    state = read_delta_state(index_dir)
    assert len(state["deltas"]) == 1
    assert state["deltas"][0]["name"].startswith("merged-")
    check("merged")
    # more deltas on top of the merged one
    _push(spark, catalog, index_dir, 4, [
        ("https://example.org/tm/90000021", "<p>ovmerge alpha REV2 w00004</p>", "en",
         False),
    ])
    check("post_merge_delta")
    # ratio trigger: bulk push comparable to the base → full fold
    _push(spark, catalog, index_dir, 5, [
        (f"https://example.org/tm/{90001000 + i}", f"<p>bulk ovmerge w{i % 5:05d} text {i}</p>",
         "en", False)
        for i in range(90)
    ], compact_ratio=0.4)
    state = read_delta_state(index_dir)
    assert not (state and state.get("deltas"))
    assert len(catalog.chain()) == 1, "documents materialized"
    check("full_fold")


def test_resolution_plan_never_shuffles_base(spark, rig):
    """100 TB plan shape: overlay resolution must broadcast the (batch-
    sized) winner srns into an anti join against the base scan — never a
    sort-merge join, which would shuffle the corpus per micro-batch."""
    root, catalog, index_dir = rig
    _push(spark, catalog, index_dir, 0, [
        ("https://example.org/ps/90000051", "<p>planshape alpha</p>", "en", False),
        ("https://example.org/ps/90000052", "<p>planshape beta</p>", "en", False),
    ])
    df = catalog.read_documents(spark)
    df.count()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_patch_mode_batch_retry_idempotent(spark, rig):
    """foreachBatch redelivers a crashed batch with the same id: after a
    crash between promote and the end of the batch, the retry must leave
    the manifest, the overlay chain, and the resolved corpus unchanged
    (hash guard → empty fresh → no-op apply; the overlay re-write bases on
    its ORIGINAL parent, never on itself)."""
    root, catalog, index_dir = rig
    rows = [
        ("https://example.org/rt/90000041", "<p>retry alpha doc</p>", "en", False),
        ("https://example.org/rt/90000042", "<p>retry beta doc</p>", "en", False),
    ]
    _push(spark, catalog, index_dir, 0, rows)
    state1 = read_delta_state(index_dir)
    chain1 = catalog.chain()
    n1 = catalog.read_documents(spark).count()
    # redeliver the SAME batch (same batch_id, same payload)
    _push(spark, catalog, index_dir, 0, rows)
    state2 = read_delta_state(index_dir)
    assert [
        (d["name"], d["seq"], d.get("dir")) for d in state2["deltas"]
    ] == [(d["name"], d["seq"], d.get("dir")) for d in state1["deltas"]]
    assert catalog.chain() == chain1
    assert catalog.read_documents(spark).count() == n1
    meta = catalog.version_meta(catalog.current())
    assert meta["base"] == "v000000"  # not self-referential after retry


def test_point_lookup_chain_precedence(spark, rig):
    """content-dedup style point lookups over the version-dir chain see the
    newest row for a doc_id (updated text), not the base copy."""
    root, catalog, index_dir = rig
    _push(spark, catalog, index_dir, 0, [
        ("https://example.org/pl/90000031", "<p>lookup original text</p>", "en", False),
    ])
    cur = catalog.current()
    ov = spark.read.parquet(catalog.version_dir(cur))
    did = ov.collect()[0]["doc_id"]
    _push(spark, catalog, index_dir, 1, [
        ("https://example.org/pl/90000031", "<p>lookup updated text</p>", "en", False),
    ])
    from harvester_spark.streaming.content_dedup import _fetch_live

    live = _fetch_live(spark, catalog.document_dirs(), [int(did)])
    import hashlib

    truth = (
        catalog.read_documents(spark)
        .filter(F.col("doc_id") == int(did))
        .collect()[0]["text"]
    )
    assert "updated" in truth
    want = hashlib.sha1(truth.encode("utf-8")).hexdigest()
    assert live[int(did)][2] == want
