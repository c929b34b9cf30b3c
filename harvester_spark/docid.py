"""Global dense docID assignment — monotonic + offset, no ``zipWithIndex``.

The scheme named by BASELINE.json's north_rule (SURVEY.md §1.4): documents are
globally sorted on a unique key (default ``(set_name, srn)``), per-partition
row counts are collected (one tiny job), an exclusive prefix sum of those
counts is broadcast, and each row's id becomes
``offset[partition] + local_position``. Because the sort keys are unique the
resulting id equals the row's **global rank in the total order** — i.e. it is
deterministic across runs even if range-partition boundaries differ, and safe
under task retries (each task recomputes the same local order).

The sorted intermediate is persisted so the counting job and the assignment
job see the identical physical partitioning (the one cross-job invariant the
scheme needs); AQE cannot re-coalesce a persisted exchange.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_COUNT_SCHEMA = "pid int, n long"


def assign_doc_ids(
    df: DataFrame,
    sort_cols: tuple[str, ...] = ("set_name", "srn"),
    num_partitions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Return ``df`` with a dense int64 ``id_col``; rows sorted by ``sort_cols``.

    The returned DataFrame is backed by a persisted sorted intermediate; call
    ``.unpersist()`` on ``result.sorted_input`` (attached attribute) once the
    result has been written if the session is long-lived.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sorted_df = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def count_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    counts = sorted_df.mapInPandas(count_partition, _COUNT_SCHEMA).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r.pid):
        offsets[row.pid] = acc
        acc += row.n
    bc_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)])
    in_cols = [f.name for f in df.schema.fields]

    def attach_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        seen = bc_offsets.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[id_col] = np.arange(seen, seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    result = sorted_df.mapInPandas(attach_ids, out_schema)
    result.sorted_input = sorted_df  # handle for explicit unpersist
    return result
