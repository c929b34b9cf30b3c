"""End-to-end build orchestration: corpus → documents → index.

The Spark rebuild of the reference's ``run_harvest`` lifecycle (SURVEY.md
§3.1): extraction, normalization, docID assignment, and index build as one
deterministic DAG, each stage materialized to parquet with ``_SUCCESS``
checkpoints (resume = skip complete stages — the anti-join-completed pattern
of /root/reference/harvester/core/processors/pipeline/base.py:100-101).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from harvester_spark import corpus as corpus_mod
from harvester_spark.docid import assign_doc_ids
from harvester_spark.extract import with_extracted_text
from harvester_spark.index.build import IndexBuilder
from harvester_spark.normalize import normalize_documents
from harvester_spark.session import restore_file_splits, tune_file_splits


def build_documents(
    corpus: DataFrame, num_partitions: int | None = None, verify_extraction: bool = True
) -> DataFrame:
    """corpus(url, warc_ts, html, [text], lang) → documents with dense doc_id.

    Runs the vectorized extractor over ``html``; when the corpus carries a
    golden ``text`` column the extractor output replaces it (they are
    byte-identical by contract — tests assert it; the build itself trusts the
    extractor, mirroring production where no golden column exists).
    """
    from pyspark import StorageLevel

    extracted = with_extracted_text(corpus.drop("text"), "html", "text")
    # Persist the normalized frame: the range partitioner's SAMPLING pass
    # executes the full upstream lineage, so without a cache the extractor
    # runs twice (sampling + sort). With properly-sized input splits
    # (session.py maxPartitionBytes) the cached variant measures faster at
    # every parallelism level. The SORTED frame is persisted separately in
    # assign_doc_ids (docid correctness requires a pinned layout).
    documents = normalize_documents(extracted).persist(StorageLevel.MEMORY_AND_DISK)
    result = assign_doc_ids(documents, ("set_name", "srn"), num_partitions)
    result.normalized_input = documents
    return result


def run_build(
    spark: SparkSession,
    out_dir: str,
    n_docs: int | None = None,
    corpus_df: DataFrame | None = None,
    resume: bool = True,
    n_shards: int = 1,
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline. Provide either ``n_docs`` (synthetic) or ``corpus_df``.

    Returns the index table dict plus ``documents``.
    """
    docs_path = os.path.join(out_dir, "documents")
    if resume and os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        documents = spark.read.parquet(docs_path)
    else:
        prior_split = None
        if corpus_df is None:
            corpus_df = corpus_mod.generate_corpus(spark, n_docs, num_partitions)
        else:
            # extract-stage parallelism is scan-split-bound (see
            # tune_file_splits) — size splits to this corpus before the
            # extractor's lineage is planned; restored after the documents
            # table is written so a long-lived session's later scans of
            # unrelated tables keep the default split size
            prior_split = tune_file_splits(spark, corpus_df)
        documents = build_documents(corpus_df, num_partitions)
        # small row groups (~4 MB ≈ 2k docs): the documents table is the
        # point-lookup store for every _source-style surface (fetch_fields,
        # MLT, highlight, content-dedup verification) — with the 128 MB
        # default one lookup decodes a whole 30k-doc text column chunk
        # (~115 ms/doc measured at 2M); row-group stats prune to ~2k docs
        # with this setting. Sequential-scan cost is unchanged (same column
        # chunks end to end, marginally more footer metadata).
        documents.write.mode("overwrite").option(
            "parquet.block.size", 4 * 1024 * 1024
        ).parquet(docs_path)
        if hasattr(documents, "sorted_input"):
            documents.sorted_input.unpersist()
        if hasattr(documents, "normalized_input"):
            documents.normalized_input.unpersist()
        restore_file_splits(spark, prior_split)
        documents = spark.read.parquet(docs_path)

    builder = IndexBuilder(spark, os.path.join(out_dir, "index"))
    tables = builder.build(
        documents, resume=resume, n_shards=n_shards, num_partitions=num_partitions
    )
    tables["documents"] = documents
    return tables
