"""Global dense docID assignment — monotonic + offset, no ``zipWithIndex``.

The scheme named by BASELINE.json's north_rule (SURVEY.md §1.4):

1. documents are globally sorted on a unique key (default ``(set_name,
   srn)``) via range partitioning + in-partition sort, and persisted so every
   downstream job sees the identical physical layout,
2. per-partition row counts are collected with a JVM-only
   ``groupBy(spark_partition_id())`` (one tiny job, no Python),
3. an exclusive prefix sum of those counts becomes a broadcast ``(pid,
   offset)`` dimension,
4. each row's id is ``offset[pid] + local_row_number``, where the local row
   number is recovered from ``monotonically_increasing_id()`` (partition id
   in the upper 31 bits, consecutive record number in the lower 33) — the
   whole assignment stays inside whole-stage codegen; no Python pass at all.

Because the sort keys are unique, the id equals the row's **global rank in
the total order** — deterministic across runs even if range-partition
boundaries differ, and safe under task retries (a retried task recomputes the
same local order from the persisted layout).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: record number bits


def assign_doc_ids(
    df: DataFrame,
    sort_cols: tuple[str, ...] = ("set_name", "srn"),
    num_partitions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Return ``df`` with a dense int64 ``id_col``; rows sorted by ``sort_cols``.

    The returned DataFrame exposes ``.sorted_input`` (the persisted sorted
    intermediate) for explicit unpersist once materialized.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sorted_df = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    counts = (
        sorted_df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    offsets = []
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets.append((int(row["pid"]), acc))
        acc += int(row["n"])
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, offset long")

    mid = F.monotonically_increasing_id()
    result = (
        sorted_df.withColumn("_mid", mid)
        .withColumn("_pid", F.shiftright(F.col("_mid"), _LOCAL_BITS).cast("int"))
        .withColumn(
            "_local",
            F.col("_mid")
            - F.shiftleft(F.shiftright(F.col("_mid"), _LOCAL_BITS), _LOCAL_BITS),
        )
        .join(F.broadcast(offsets_df), F.col("_pid") == F.col("pid"), "inner")
        .withColumn(id_col, (F.col("offset") + F.col("_local")).cast("long"))
        .drop("_mid", "_pid", "_local", "pid", "offset")
    )
    result.sorted_input = sorted_df
    return result
