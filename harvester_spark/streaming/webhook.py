"""Webhook-style point ingest as Structured Streaming.

The reference accepts per-record JSON pushes that update one Set immediately
and dispatch processing (/root/reference/harvester/products/views/
webhook.py:13-42; record validation sources/webhooks/utils.py:14-60). The
Spark rebuild is a file-drop (or any streaming) source processed with
``foreachBatch``: each micro-batch runs the SAME extraction + hash-guarded
merge as the batch pipeline and appends an index delta, then atomically
promotes the new documents version. ``foreachBatch`` serializes batches per
query — the single-writer guarantee the reference gets from row locks
(core/processors/pipeline/resource.py:119-135) for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from harvester_spark.index.catalog import IndexCatalog
from harvester_spark.streaming.incremental import (
    apply_index_delta,
    changed_and_deleted,
    merge_documents,
    normalize_delta,
)

WEBHOOK_SCHEMA = "url string, warc_ts timestamp, html string, lang string, deleted boolean"

# Auto-compaction policy (round-3): the delta chain trades write
# amplification for read amplification — every query merges base ∪ deltas
# minus tombstones. The streaming loop folds the chain back into a clean
# base when EITHER trigger fires:
#   - delta COUNT ≥ COMPACT_MAX_DELTAS (merge cost grows per delta), or
#   - delta:base postings SIZE ratio ≥ COMPACT_DELTA_RATIO (rewrite cost is
#     now comparable to what it buys — the classic LSM/lakehouse trigger).
# Equivalent of the reference's rebuild-into-new-index + alias swap
# (/root/reference/harvester/search/models/index.py:72-156) driven by a
# policy instead of an operator.
COMPACT_MAX_DELTAS = 8
COMPACT_DELTA_RATIO = 0.5


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def should_compact(
    index_dir: str,
    max_deltas: int = COMPACT_MAX_DELTAS,
    ratio: float = COMPACT_DELTA_RATIO,
) -> bool:
    """Compaction trigger over the live delta manifest + postings sizes.
    (On a cluster both inputs come from catalog statistics, not a walk.)"""
    from harvester_spark.search.engine import read_delta_state

    state = read_delta_state(index_dir)
    if not state or not state.get("deltas"):
        return False
    if len(state["deltas"]) >= max_deltas:
        return True
    base = _dir_bytes(os.path.join(index_dir, "postings"))
    delta = _dir_bytes(os.path.join(index_dir, "postings_delta"))
    return base > 0 and delta / base >= ratio


def recover_interrupted_compaction(index_dir: str) -> None:
    """Crash recovery for the in-place swap: ``compact_in_place`` renames
    ``dir → dir.old`` then ``dir.compact → dir``. A crash between the two
    leaves no live dir — prefer the finished compact build, else restore
    the old dir. Idempotent; the single-writer foreachBatch loop calls it
    before each batch."""
    if os.path.isdir(index_dir):
        return
    tmp, old = index_dir + ".compact", index_dir + ".old"
    if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "dictionary")):
        os.rename(tmp, index_dir)
    elif os.path.isdir(old):
        os.rename(old, index_dir)


def process_webhook_batch(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    docs_catalog: IndexCatalog,
    index_dir: str,
    compact_max_deltas: int = COMPACT_MAX_DELTAS,
    compact_ratio: float = COMPACT_DELTA_RATIO,
    keep_versions: int = 4,
    decompound_words=None,
    dedup_content: bool = False,
) -> None:
    """One micro-batch: extract → merge → delta-index → promote →
    (policy-triggered) compact + version GC.

    ``dedup_content=True`` turns on exact current-content dedup at the
    ingest seam (streaming/content_dedup.py): pushes whose text already
    lives in the corpus under a different srn are dropped before the merge
    (bounded digest-partition probe + doc_id point verification — never a
    corpus scan)."""
    recover_interrupted_compaction(index_dir)
    if batch_df.isEmpty():
        return
    # Own the cache lifetime here: normalize_delta needs the batch cached
    # (tombstone re-attach join reads it twice), but a long-lived stream must
    # not accumulate one cached frame per micro-batch — unpersist once the
    # batch's writes have all completed (promote is only a manifest swap).
    delta_corpus = batch_df.withColumn(
        "html", F.encode(F.col("html"), "UTF-8")
    ).cache()
    cached_frames = []
    try:
        delta = normalize_delta(delta_corpus)
        base = spark.read.parquet(docs_catalog.current_dir())
        if dedup_content:
            from harvester_spark.streaming.content_dedup import (
                ensure_digest_table,
                filter_seen_content,
            )

            ensure_digest_table(spark, base, index_dir)
            delta = delta.cache()
            cached_frames.append(delta)
            delta = filter_seen_content(
                spark, delta, docs_catalog.current_dir(), index_dir
            )
            if delta.isEmpty():  # all pushes were duplicates: no-op batch
                return
        merged = merge_documents(base, delta)
        fresh, tombstones = changed_and_deleted(base, merged)
        if dedup_content:
            # the digest append after promote must not recompute the merge
            # (another base scan); fresh is batch-sized — cache it across
            # the index apply
            fresh = fresh.cache()
            cached_frames.append(fresh)
        new_version = f"v{batch_id + 1:06d}"
        # small row groups: the versioned documents table serves point
        # lookups (fetch_fields / highlight / content-dedup verification) —
        # see pipeline.run_build for the measured rationale
        merged.write.mode("overwrite").option(
            "parquet.block.size", 4 * 1024 * 1024
        ).parquet(docs_catalog.version_dir(new_version))
        merged_read = spark.read.parquet(docs_catalog.version_dir(new_version))
        apply_index_delta(
            spark,
            index_dir,
            merged_read,
            fresh,
            tombstones,
            delta_name=f"delta-{batch_id}",
            decompound_words=decompound_words,
        )
        docs_catalog.promote(new_version)  # atomic publish, last step
        if dedup_content:
            from harvester_spark.streaming.content_dedup import append_digests

            # after promote: a crash here loses digest rows (future
            # duplicates possible, false drops never); compaction heals
            append_digests(spark, fresh, index_dir)
        if should_compact(index_dir, compact_max_deltas, compact_ratio):
            from harvester_spark.streaming.compaction import compact_in_place

            # fold deltas + tombstones into a clean base (same analyzer
            # chain, proven == rebuild by the compaction battery), then GC
            # superseded document versions — the catalog-expire analogue of
            # delta GC (the swapped-out .old dir holds the old deltas and is
            # removed by the swap itself)
            compact_in_place(
                spark, index_dir, merged_read, decompound_words=decompound_words
            )
            docs_catalog.expire(keep=keep_versions)
            if dedup_content:
                from harvester_spark.streaming.content_dedup import build_digest_table

                # GC stale sidecar rows + re-bound the file count
                build_digest_table(spark, merged_read, index_dir)
    finally:
        delta_corpus.unpersist()
        for f in cached_frames:
            f.unpersist()


def start_webhook_stream(
    spark: SparkSession,
    drop_dir: str,
    docs_catalog: IndexCatalog,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    compact_max_deltas: int = COMPACT_MAX_DELTAS,
    compact_ratio: float = COMPACT_DELTA_RATIO,
    keep_versions: int = 4,
    decompound_words=None,
    dedup_content: bool = False,
):
    """Start the ingest stream over a JSON drop directory.

    ``max_files_per_trigger`` bounds each micro-batch (files per trigger) —
    with ``available_now`` it drains the backlog as a SEQUENCE of batches
    instead of one, exercising the stacked-delta path. The compaction policy
    (``compact_max_deltas`` / ``compact_ratio``) runs inside the same
    serialized foreachBatch loop — single writer, so compaction never races
    a delta apply."""
    os.makedirs(drop_dir, exist_ok=True)
    reader = spark.readStream.schema(WEBHOOK_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.json(drop_dir)
    writer = stream.writeStream.foreachBatch(
        lambda bdf, bid: process_webhook_batch(
            spark, bdf, bid, docs_catalog, index_dir,
            compact_max_deltas=compact_max_deltas,
            compact_ratio=compact_ratio,
            keep_versions=keep_versions,
            decompound_words=decompound_words,
            dedup_content=dedup_content,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
