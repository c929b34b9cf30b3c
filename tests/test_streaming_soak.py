"""Long-run streaming soak (round-4, VERDICT r3 #7).

The round-3 ADVICE bug class — a deterministic KeyError after 4096 distinct
merged-cache inserts, plus a per-batch cache leak — was found by inspection,
not by tests. This soak makes that class reproducible: it drives MANY
micro-batches through ``process_webhook_batch`` with the compaction policy
firing every few batches and the DeltaSearcher eviction thresholds scaled
to 1/100 (MERGED_CACHE_MAX 40, POS_CACHE_MAX 10), forcing hundreds of
eviction cycles in minutes, and asserts THROUGHOUT:

- serving identity: DeltaSearcher over the live delta chain equals a fresh
  rebuild of the current corpus, bit-for-bit (docIDs AND scores),
- bounded state: the JVM never accumulates cached frames across batches
  (the ADVICE leak), the delta chain length respects the compaction
  policy, the Python caches respect their (lowered) thresholds, and
  driver RSS growth over the soak stays bounded.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.index.build import IndexBuilder
from harvester_spark.index.catalog import IndexCatalog
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.streaming.incremental import DeltaSearcher
from harvester_spark.streaming.webhook import process_webhook_batch

N_BASE = 80
N_BATCHES = 60
COMPACT_EVERY = 3  # compact_max_deltas — fires ~every 3rd batch
CHECK_EVERY = 20

QUERIES = ["w00000", "w00001", "w00000 w00001", "soak", "term_7"]


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _batch_df(spark, batch_ix: int):
    """2 new docs + 1 update of an earlier push + periodic delete."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = []
    for j in (0, 1):
        i = 90_000_000 + 10 * batch_ix + j
        rows.append(
            (
                f"https://example.org/alpha/{i}",
                ts,
                f"<p>soak pushed document w{batch_ix % 7:05d} marker{i}</p>",
                "en",
                False,
            )
        )
    if batch_ix > 0:
        upd = 90_000_000 + 10 * (batch_ix - 1)
        rows.append(
            (
                f"https://example.org/alpha/{upd}",
                ts,
                f"<p>soak updated document w00001 rev{batch_ix}</p>",
                "en",
                False,
            )
        )
    if batch_ix % 7 == 3 and batch_ix > 7:
        victim = 90_000_000 + 10 * (batch_ix - 7) + 1
        rows.append(
            (f"https://example.org/alpha/{victim}", ts, "<p>x</p>", "en", True)
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html string, lang string, deleted boolean"
    )


def _assert_identity(spark, index_dir, catalog, rebuild_dir, lowered=True):
    """DeltaSearcher over the live chain == fresh rebuild, bit-for-bit."""
    docs = catalog.read_documents(spark)
    shutil.rmtree(rebuild_dir, ignore_errors=True)
    rb = IndexBuilder(spark, rebuild_dir)
    rb.build(docs, resume=False, num_partitions=4)
    ds = DeltaSearcher(spark, index_dir)
    if lowered:
        ds.MERGED_CACHE_MAX = 40
        ds.POS_CACHE_MAX = 10
    rs = IndexSearcher(spark, rebuild_dir)
    for q in QUERIES:
        a = ds.search(q, k=20).topk
        b = rs.search(q, k=20).topk
        assert list(a["doc_id"]) == list(b["doc_id"]), q
        assert (
            np.asarray(a["score"], float) == np.asarray(b["score"], float)
        ).all(), q
    return ds


@pytest.mark.slow
def test_streaming_soak_eviction_compaction_identity(spark, tmp_root):
    root = os.path.join(tmp_root, "soak")
    out = os.path.join(root, "base")
    run_build(spark, out, n_docs=N_BASE, resume=False, num_partitions=2)

    catalog = IndexCatalog(os.path.join(root, "catalog"))
    os.makedirs(catalog.version_dir("v000000"), exist_ok=True)
    for f in os.listdir(f"{out}/documents"):
        shutil.copy(f"{out}/documents/{f}", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(root, "index")
    shutil.copytree(f"{out}/index", index_dir)
    rebuild_dir = os.path.join(root, "rebuild")

    rss_baseline = None
    rdd_baseline = _persistent_rdd_count(spark)
    for b in range(N_BATCHES):
        process_webhook_batch(
            spark,
            _batch_df(spark, b),
            b,
            catalog,
            index_dir,
            compact_max_deltas=COMPACT_EVERY,
            keep_versions=2,
        )
        # the ADVICE leak class: no cached frame may outlive its batch
        assert _persistent_rdd_count(spark) <= rdd_baseline + 2, b
        from harvester_spark.search.engine import read_delta_state

        state = read_delta_state(index_dir)
        n_deltas = len(state["deltas"]) if state else 0
        assert n_deltas <= COMPACT_EVERY, (b, n_deltas)
        if b == 9:
            rss_baseline = _rss_mb()
        if (b + 1) % CHECK_EVERY == 0:
            _assert_identity(spark, index_dir, catalog, rebuild_dir)

    # ---- eviction cycling at 1/100-scale thresholds over one long-lived
    # searcher: hundreds of distinct (term, lang) entries force dozens of
    # clear cycles; results must stay correct ACROSS evictions and the
    # caches must respect their bounds at every step.
    ds = _assert_identity(spark, index_dir, catalog, rebuild_dir)
    rs = IndexSearcher(spark, rebuild_dir)
    from harvester_spark.search.phrase import phrase_match_ids

    probe = [f"w{i:05d}" for i in range(120)]  # mostly-absent terms churn too
    for i, t in enumerate(probe):
        ds.search(t, k=5)
        if ds._dfs([t], "all")[t] > 0:
            phrase_match_ids(ds, f"{t} w00001")  # positional cache churn
        assert len(ds._merged_cache) <= ds.MERGED_CACHE_MAX + 2, (i, t)
        assert len(ds._pos_cache) <= ds.POS_CACHE_MAX + 2, (i, t)
        if i % 17 == 0:  # re-query an evicted early term: still identical
            a = ds.search("w00000 w00001", k=20).topk
            b2 = rs.search("w00000 w00001", k=20).topk
            assert list(a["doc_id"]) == list(b2["doc_id"])
            assert (
                np.asarray(a["score"], float) == np.asarray(b2["score"], float)
            ).all()

    # driver RSS growth since batch 10 stays bounded (python-side leaks;
    # generous slack for allocator/JVM-client noise)
    assert rss_baseline is not None
    growth = _rss_mb() - rss_baseline
    assert growth < 400, f"driver RSS grew {growth:.0f} MB over the soak"
