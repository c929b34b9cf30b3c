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
        # Serial-floor overlap (round-5): the head-term sample tokenizes a
        # ~20k-doc sample of the (persisted) sorted frame — run it on a
        # worker thread DURING the documents write below. The hash-based
        # sampling in sample_head_terms is layout-independent, so these
        # rows are identical to what an in-build (parquet-backed) sample
        # would draw and resume builds stay byte-identical.
        lang_counts = getattr(documents, "lang_counts", None)
        head_holder: dict = {}
        head_thread = None
        if lang_counts is not None:
            import threading

            from pyspark.sql import functions as F

            from harvester_spark.index.build import (
                HEAD_CHUNK_TARGET,
                HEAD_DF_THRESHOLD,
                sample_head_terms,
            )

            n_all = sum(n for _lang, _state, n, _sl in lang_counts)
            sample_src = documents
            if "state" in documents.columns:
                sample_src = documents.filter(F.col("state") == "active")
            sample_src = sample_src.select("doc_id", "text", "lang", "doc_len")

            def _head_sample():
                try:
                    est = sample_head_terms(
                        sample_src, n_all, HEAD_DF_THRESHOLD, HEAD_CHUNK_TARGET
                    )
                    head_holder["rows"] = None if est is None else est.collect()
                except BaseException as exc:  # surfaced on join
                    head_holder["err"] = exc

            head_thread = threading.Thread(target=_head_sample, daemon=True)
            head_thread.start()
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
        if head_thread is not None:
            head_thread.join()
            if "err" in head_holder:
                raise head_holder["err"]
        if hasattr(documents, "sorted_input"):
            documents.sorted_input.unpersist()
        if hasattr(documents, "normalized_input"):
            documents.normalized_input.unpersist()
        restore_file_splits(spark, prior_split)
        documents = spark.read.parquet(docs_path)

        builder = IndexBuilder(spark, os.path.join(out_dir, "index"))
        tables = builder.build(
            documents,
            resume=resume,
            n_shards=n_shards,
            num_partitions=num_partitions,
            precomputed_lang_counts=lang_counts,
            **(
                {"precomputed_head_terms": head_holder["rows"]}
                if "rows" in head_holder
                else {}
            ),
        )
        tables["documents"] = documents
        return tables

    builder = IndexBuilder(spark, os.path.join(out_dir, "index"))
    tables = builder.build(
        documents, resume=resume, n_shards=n_shards, num_partitions=num_partitions
    )
    tables["documents"] = documents
    return tables
