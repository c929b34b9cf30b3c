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


def process_webhook_batch(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    docs_catalog: IndexCatalog,
    index_dir: str,
) -> None:
    """One micro-batch: extract → merge → delta-index → promote."""
    if batch_df.isEmpty():
        return
    # Own the cache lifetime here: normalize_delta needs the batch cached
    # (tombstone re-attach join reads it twice), but a long-lived stream must
    # not accumulate one cached frame per micro-batch — unpersist once the
    # batch's writes have all completed (promote is only a manifest swap).
    delta_corpus = batch_df.withColumn(
        "html", F.encode(F.col("html"), "UTF-8")
    ).cache()
    try:
        delta = normalize_delta(delta_corpus)
        base = spark.read.parquet(docs_catalog.current_dir())
        merged = merge_documents(base, delta)
        fresh, tombstones = changed_and_deleted(base, merged)
        new_version = f"v{batch_id + 1:06d}"
        merged.write.mode("overwrite").parquet(docs_catalog.version_dir(new_version))
        merged_read = spark.read.parquet(docs_catalog.version_dir(new_version))
        apply_index_delta(
            spark,
            index_dir,
            merged_read,
            fresh,
            tombstones,
            delta_name=f"delta-{batch_id}",
        )
        docs_catalog.promote(new_version)  # atomic publish, last step
    finally:
        delta_corpus.unpersist()


def start_webhook_stream(
    spark: SparkSession,
    drop_dir: str,
    docs_catalog: IndexCatalog,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Start the ingest stream over a JSON drop directory.

    ``max_files_per_trigger`` bounds each micro-batch (files per trigger) —
    with ``available_now`` it drains the backlog as a SEQUENCE of batches
    instead of one, exercising the stacked-delta path."""
    os.makedirs(drop_dir, exist_ok=True)
    reader = spark.readStream.schema(WEBHOOK_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.json(drop_dir)
    writer = stream.writeStream.foreachBatch(
        lambda bdf, bid: process_webhook_batch(spark, bdf, bid, docs_catalog, index_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
