"""Streaming content-dedup e2e: exact current-content semantics at the
ingest seam — duplicates dropped, deleted/updated-away content ingestable
again, stale sidecar rows never cause false drops, flag-off unchanged."""

from __future__ import annotations

import hashlib
import os
import shutil
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from harvester_spark.corpus import corpus_pdf
from harvester_spark.index.catalog import IndexCatalog
from harvester_spark.pipeline import run_build
from harvester_spark.streaming.webhook import process_webhook_batch

SCHEMA = "url string, warc_ts timestamp, html string, lang string, deleted boolean"
T0 = datetime(2024, 6, 1)


def _srn(url: str) -> str:
    set_name = url.split("/")[3]
    return f"{set_name}:{hashlib.sha1(url.encode()).hexdigest()}"


def _setup(spark, tmp_root, name, n_docs=40):
    root = os.path.join(tmp_root, name)
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=n_docs, resume=False, num_partitions=2)
    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)
    return catalog, index_dir


def _push(spark, catalog, index_dir, bid, rows, dedup=True):
    bdf = spark.createDataFrame(rows, SCHEMA)
    process_webhook_batch(
        spark, bdf, bid, catalog, index_dir, dedup_content=dedup
    )


def _docs(spark, catalog):
    return catalog.read_documents(spark)


def _has_url(spark, catalog, url) -> bool:
    return (
        _docs(spark, catalog)
        .filter((F.col("url") == url) & (F.col("state") == "active"))
        .count()
        == 1
    )


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    return _setup(spark, tmp_root, "cdedup")


def test_duplicate_of_base_doc_is_dropped(spark, env):
    catalog, index_dir = env
    doc0 = corpus_pdf([0]).iloc[0]  # regenerate base doc 0's exact html
    dup_url = "https://example.org/alpha/70000001"
    fresh_url = "https://example.org/alpha/70000002"
    _push(spark, catalog, index_dir, 0, [
        (dup_url, T0, doc0.html.decode("utf-8"), doc0.lang, False),
        (fresh_url, T0, "<p>genuinely new zebra document</p>", "en", False),
    ])
    assert not _has_url(spark, catalog, dup_url)      # same text as doc 0
    assert _has_url(spark, catalog, fresh_url)        # novel content kept


def test_in_batch_duplicates_keep_smallest_srn(spark, env):
    catalog, index_dir = env
    u1 = "https://example.org/alpha/70000011"
    u2 = "https://example.org/alpha/70000012"
    html = "<p>same twice in one batch quokka</p>"
    _push(spark, catalog, index_dir, 1, [
        (u1, T0, html, "en", False),
        (u2, T0, html, "en", False),
    ])
    winner = min([u1, u2], key=_srn)
    loser = u2 if winner == u1 else u1
    assert _has_url(spark, catalog, winner)
    assert not _has_url(spark, catalog, loser)


def test_self_repush_is_not_a_duplicate(spark, env):
    catalog, index_dir = env
    url = "https://example.org/alpha/70000002"
    n_before = _docs(spark, catalog).count()
    _push(spark, catalog, index_dir, 2, [
        (url, T0 + timedelta(days=1), "<p>genuinely new zebra document</p>", "en", False),
    ])
    # same srn holding the same text: passes the filter, merge no-ops
    assert _has_url(spark, catalog, url)
    assert _docs(spark, catalog).count() == n_before


def test_all_duplicate_batch_is_a_noop(spark, env):
    catalog, index_dir = env
    before = catalog.current()
    _push(spark, catalog, index_dir, 3, [
        ("https://example.org/alpha/70000021", T0,
         "<p>genuinely new zebra document</p>", "en", False),
    ])
    assert catalog.current() == before  # no version bump for an empty merge


def test_deleted_content_is_ingestable_again(spark, env):
    catalog, index_dir = env
    holder = "https://example.org/alpha/70000002"
    _push(spark, catalog, index_dir, 4, [
        (holder, T0 + timedelta(days=2), "<p>x</p>", "en", True),  # delete
    ])
    reborn = "https://example.org/alpha/70000031"
    _push(spark, catalog, index_dir, 5, [
        (reborn, T0 + timedelta(days=3),
         "<p>genuinely new zebra document</p>", "en", False),
    ])
    # the sidecar row for the deleted holder is stale; verification must
    # see state != active and ACCEPT the re-ingest
    assert _has_url(spark, catalog, reborn)


def test_updated_away_content_is_ingestable_again(spark, env):
    catalog, index_dir = env
    holder = min(
        ["https://example.org/alpha/70000011", "https://example.org/alpha/70000012"],
        key=_srn,
    )
    old_html = "<p>same twice in one batch quokka</p>"
    _push(spark, catalog, index_dir, 6, [
        (holder, T0 + timedelta(days=4), "<p>holder moved on wallaby</p>", "en", False),
    ])
    reborn = "https://example.org/alpha/70000041"
    _push(spark, catalog, index_dir, 7, [
        (reborn, T0 + timedelta(days=5), old_html, "en", False),
    ])
    # stale digest row points at the holder, whose text no longer matches —
    # point verification must accept the newcomer
    assert _has_url(spark, catalog, reborn)
    # and the moved-on holder text is searchable
    from harvester_spark.streaming.incremental import DeltaSearcher

    ds = DeltaSearcher(spark, index_dir)
    holder_id = _docs(spark, catalog).filter(F.col("url") == holder).collect()[0].doc_id
    assert holder_id in set(ds.search("wallaby", k=10).topk["doc_id"])


def test_flag_off_keeps_duplicates(spark, tmp_root):
    catalog, index_dir = _setup(spark, tmp_root, "cdedup_off", n_docs=20)
    doc0 = corpus_pdf([0]).iloc[0]
    dup_url = "https://example.org/alpha/70000001"
    _push(spark, catalog, index_dir, 0, [
        (dup_url, T0, doc0.html.decode("utf-8"), doc0.lang, False),
    ], dedup=False)
    assert _has_url(spark, catalog, dup_url)  # back-compat: no dedup


def test_digest_sidecar_is_partition_pruned(spark, env):
    """The probe must read only the batch's digest partitions (the
    dict_probe contract): sidecar scan with a dp filter prunes to <= the
    number of distinct batch prefixes."""
    _, index_dir = env
    from harvester_spark.streaming.content_dedup import digests_dir

    side = spark.read.parquet(digests_dir(index_dir)).filter(
        F.col("dp").isin(["aa", "bb"])
    )
    plan = side._jdf.queryExecution().executedPlan().toString()
    # the dp predicate must land in PartitionFilters (directory-level
    # pruning), NOT DataFilters (row-level, after reading everything)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dp" in m.group(1) and "IN" in m.group(1), plan


def test_stream_level_flag_plumbs_through(spark, tmp_root):
    """dedup_content must reach the foreachBatch loop through
    start_webhook_stream: a drop-dir batch with one duplicate-of-base push
    and one novel push ingests only the novel one."""
    import json

    from harvester_spark.streaming.webhook import start_webhook_stream

    catalog, index_dir = _setup(spark, tmp_root, "cdedup_stream", n_docs=20)
    doc0 = corpus_pdf([0]).iloc[0]
    drop = os.path.join(tmp_root, "cdedup_stream", "drop")
    os.makedirs(drop, exist_ok=True)
    rows = [
        {"url": "https://example.org/alpha/70000051",
         "warc_ts": "2024-06-01T00:00:00.000Z",
         "html": doc0.html.decode("utf-8"), "lang": doc0.lang, "deleted": False},
        {"url": "https://example.org/alpha/70000052",
         "warc_ts": "2024-06-01T00:00:00.000Z",
         "html": "<p>streamed novel capybara text</p>", "lang": "en",
         "deleted": False},
    ]
    with open(os.path.join(drop, "batch1.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    q = start_webhook_stream(
        spark, drop, catalog, index_dir,
        os.path.join(tmp_root, "cdedup_stream", "ckpt"),
        available_now=True, dedup_content=True,
    )
    q.awaitTermination(120)
    assert not _has_url(spark, catalog, rows[0]["url"])  # duplicate dropped
    assert _has_url(spark, catalog, rows[1]["url"])      # novel kept
