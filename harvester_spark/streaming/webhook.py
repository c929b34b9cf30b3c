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


def _live_delta_bytes(index_dir: str, state: dict) -> int:
    """Bytes of the manifest-LISTED delta postings only — staged-but-
    superseded dirs (crashed attempts, tier-merged members awaiting the
    next base fold) are garbage and must not trip the ratio trigger."""
    total = 0
    for d in state.get("deltas", []):
        if d.get("has_postings", True):
            total += _dir_bytes(
                os.path.join(
                    index_dir, "postings_delta", f"delta={d.get('dir', d['name'])}"
                )
            )
    return total


def should_compact(
    index_dir: str,
    max_deltas: int = COMPACT_MAX_DELTAS,
    ratio: float = COMPACT_DELTA_RATIO,
) -> str | None:
    """Compaction decision over the live delta manifest + postings sizes:
    ``'full'`` (delta mass is comparable to the base — fold everything into
    a clean base, the LSM/lakehouse major compaction), ``'merge'`` (too
    many small deltas — tier-merge them into one, bounding read
    amplification without touching the base), or None. (On a cluster both
    inputs come from catalog statistics, not a walk.)"""
    from harvester_spark.search.engine import read_delta_state

    state = read_delta_state(index_dir)
    if not state or not state.get("deltas"):
        return None
    base = _dir_bytes(os.path.join(index_dir, "postings"))
    delta = _live_delta_bytes(index_dir, state)
    if base > 0 and delta / base >= ratio:
        return "full"
    if len(state["deltas"]) >= max_deltas:
        # merging a single delta is a no-op — a 1-delta policy means fold
        return "merge" if len(state["deltas"]) >= 2 else "full"
    return None


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
        cur_name = docs_catalog.current()
        base = docs_catalog.read_documents(spark)
        if dedup_content:
            from harvester_spark.streaming.content_dedup import (
                ensure_digest_table,
                filter_seen_content,
            )

            ensure_digest_table(spark, base, index_dir)
            delta = delta.cache()
            cached_frames.append(delta)
            delta = filter_seen_content(
                spark, delta, docs_catalog.document_dirs(), index_dir
            )
            if delta.isEmpty():  # all pushes were duplicates: no-op batch
                return
        # ---- O(batch) merge: the batch touches only its own srns, so the
        # base side is a PRUNED scan (srn IN (...) reaches the parquet
        # row-group statistics — documents are (set_name, srn)-ordered by
        # the docID scheme), and the new documents version is an OVERLAY
        # holding just the post-merge rows for those srns. A 500-doc push
        # against a 100 TB corpus must never rewrite (or shuffle) the
        # corpus; read amplification is bounded by the compaction policy
        # below, exactly like the index's own delta chain.
        delta = delta.cache()
        cached_frames.append(delta)
        srns = [r["srn"] for r in delta.select("srn").distinct().collect()]
        base_touched = base.filter(F.col("srn").isin(srns))
        max_id = docs_catalog.max_doc_id(spark, cur_name)
        merged_touched = merge_documents(
            base_touched, delta, max_doc_id=max_id
        ).cache()
        cached_frames.append(merged_touched)
        fresh, tombstones = changed_and_deleted(base_touched, merged_touched)
        fresh = fresh.cache()
        cached_frames.append(fresh)
        tombstones = tombstones.cache()
        cached_frames.append(tombstones)
        new_version = f"v{batch_id + 1:06d}"
        # retry after a crash BETWEEN promote and the digest append: the
        # overlay must base on its original parent, never on itself (read
        # the surviving meta BEFORE the overwrite below deletes it)
        base_name = (
            cur_name
            if cur_name != new_version
            else (docs_catalog.version_meta(new_version) or {}).get("base")
        )
        # small row groups: the versioned documents table serves point
        # lookups (fetch_fields / highlight / content-dedup verification) —
        # see pipeline.run_build for the measured rationale
        merged_touched.write.mode("overwrite").option(
            "parquet.block.size", 4 * 1024 * 1024
        ).parquet(docs_catalog.version_dir(new_version))
        row = merged_touched.agg(F.max("doc_id")).collect()[0][0]
        new_max = max(max_id, -1 if row is None else int(row))
        docs_catalog.write_version_meta(
            new_version, {"base": base_name, "max_doc_id": new_max}
        )
        # stats patch: upserts for re-indexed actives, removal markers
        # (carrying the OLD lang/len for the exact totals fold) for every
        # previously-active row this batch supersedes
        removed = (
            base_touched.join(tombstones, "doc_id", "semi")
            .select("doc_id", "lang", "doc_len")
            .withColumn("removed", F.lit(True))
        )
        stats_patch = (
            fresh.filter(F.col("state") == "active")
            .select("doc_id", "lang", "doc_len")
            .withColumn("removed", F.lit(False))
            .unionByName(removed)
        )
        apply_index_delta(
            spark,
            index_dir,
            None,
            fresh,
            tombstones,
            delta_name=f"delta-{batch_id}",
            decompound_words=decompound_words,
            stats_patch=stats_patch,
            max_doc_id=new_max,
        )
        docs_catalog.promote(new_version)  # atomic publish, last step
        if dedup_content:
            from harvester_spark.streaming.content_dedup import append_digests

            # after promote: a crash here loses digest rows (future
            # duplicates possible, false drops never); compaction heals
            append_digests(spark, fresh, index_dir)
        decision = should_compact(index_dir, compact_max_deltas, compact_ratio)
        if decision == "full":
            from harvester_spark.streaming.compaction import compact_in_place

            # fold deltas + tombstones into a clean base (same analyzer
            # chain, proven == rebuild by the compaction battery) AND
            # materialize the documents overlay chain into a clean version,
            # then GC superseded document versions — the catalog-expire
            # analogue of delta GC (the swapped-out .old dir holds the old
            # deltas and is removed by the swap itself)
            merged_read = docs_catalog.read_documents(spark, new_version)
            compact_in_place(
                spark, index_dir, merged_read, decompound_words=decompound_words
            )
            mat_version = new_version + "m"
            merged_read.write.mode("overwrite").option(
                "parquet.block.size", 4 * 1024 * 1024
            ).parquet(docs_catalog.version_dir(mat_version))
            docs_catalog.write_version_meta(
                mat_version, {"max_doc_id": new_max}
            )
            docs_catalog.promote(mat_version)
            docs_catalog.expire(keep=keep_versions)
            if dedup_content:
                from harvester_spark.streaming.content_dedup import build_digest_table

                # GC stale sidecar rows + re-bound the file count
                build_digest_table(
                    spark,
                    spark.read.parquet(docs_catalog.version_dir(mat_version)),
                    index_dir,
                )
        elif decision == "merge":
            from harvester_spark.streaming.compaction import merge_deltas

            # tier-merge: fold the delta chain into ONE delta (and the
            # overlay chain into one overlay) — O(docs pushed since the
            # last base fold), never O(corpus). Read amplification stays
            # bounded without paying a base rewrite every few batches.
            merge_deltas(
                spark, index_dir, docs_catalog, decompound_words=decompound_words
            )
            docs_catalog.expire(keep=keep_versions)
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
