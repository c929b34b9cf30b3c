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

    # The count job is the build's one unavoidable serial materialization
    # (it realizes the persisted sorted layout), so it moonlights as the
    # corpus-stats pass: grouping by (pid, lang[, state]) costs the same
    # tiny shuffle and hands the index builder per-language doc counts and
    # doc_len sums for free — corpus_stats then needs NO job of its own and
    # doc_stats can run concurrently with the postings encode
    # (IndexBuilder._build_impl). Offsets are per-pid sums over the groups,
    # bit-identical to the old groupBy(pid) (docID determinism invariant).
    stats_cols = [c for c in ("lang", "state") if c in df.columns]
    aggs = [F.count("*").alias("n")]
    if "doc_len" in df.columns and "lang" in df.columns:
        aggs.append(F.sum("doc_len").alias("sum_len"))
    counts = (
        sorted_df.groupBy(F.spark_partition_id().alias("pid"), *stats_cols)
        .agg(*aggs)
        .collect()
    )
    per_pid: dict[int, int] = {}
    for row in counts:
        per_pid[int(row["pid"])] = per_pid.get(int(row["pid"]), 0) + int(row["n"])
    offsets = []
    acc = 0
    for pid in sorted(per_pid):
        offsets.append((pid, acc))
        acc += per_pid[pid]
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
    if counts and "sum_len" in counts[0].asDict():
        # (lang, state|None) → [n, sum_len], summed over pids — consumed by
        # IndexBuilder.build(precomputed_lang_counts=...) via run_build
        acc_ls: dict[tuple, list[int]] = {}
        for row in counts:
            d = row.asDict()
            key = (d["lang"], d.get("state"))
            slot = acc_ls.setdefault(key, [0, 0])
            slot[0] += int(d["n"])
            slot[1] += int(d["sum_len"])
        result.lang_counts = [
            (lang, state, n, sum_len)
            for (lang, state), (n, sum_len) in sorted(
                acc_ls.items(), key=lambda kv: (str(kv[0][0]), str(kv[0][1]))
            )
        ]
    return result
