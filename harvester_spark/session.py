"""SparkSession construction for the engine.

Local-mode tuned defaults (tests/bench run on ``local[N]``) that still encode
the cluster-scale intent: AQE on for skew-join splitting and runtime
coalescing, Arrow enabled for every pandas-UDF boundary, shuffle partitions
sized to cores rather than the 200 default. On a real cluster the same
builder is used with ``master`` left to ``spark-submit``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def local_path(uri: str) -> str:
    """Local filesystem path from a Hadoop/Spark file URI.

    ``Path.toString`` renders local URIs as any of ``file:/p``,
    ``file:///p`` or a bare ``/p`` depending on the code path — a naive
    ``f[7:]`` slice silently yields garbage for the single-slash form (and
    every footer-read/size-read optimization built on it no-ops). One
    parser, shared by session/build/api."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) or uri
    return uri


def get_spark(
    app_name: str = "harvester_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master=None`` honours an externally-set master (spark-submit); tests pass
    ``local[N]`` explicitly. ``SPARK_GRAFT_CPUS`` controls default local
    parallelism, mirroring the driver's bench contract.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # HS_ARROW_BATCH: smaller batches cap per-python-worker RSS on
        # memory-tight very-large builds (32 workers × batch buffers add up)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("HS_ARROW_BATCH", "10000"),
        )
        # Python-heavy per-byte stages (extract/tokenize) need MORE input
        # splits than the 128 MB default gives: a 470 MB corpus becomes ~4
        # scan partitions and caps the whole extract phase at 4-way
        # parallelism regardless of cores. 16 MB ≈ 30 splits there; on a
        # cluster this maps to Iceberg's read.split.target-size.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # cache builds of wide text frames are CPU-bound on codec work;
        # local-mode memory is plentiful, so trade space for build speed
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    # Shuffle/spill through tmpfs when available: local-mode shuffles are
    # disk-bound otherwise (the sandbox root disk writes ~260 MB/s vs ~2 GB/s
    # tmpfs). On a real cluster this is the executors' local NVMe.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def tune_file_splits(spark: SparkSession, df, waves: int = 3) -> str | None:
    """Size ``spark.sql.files.maxPartitionBytes`` to the ACTUAL input so a
    full scan of ``df`` yields ≥ ``waves`` tasks per core.

    The Python-heavy per-byte stages (extract, tokenize) are throughput-
    bound by scan parallelism: with the static 16 MB default a 140 MB
    corpus becomes ~11 splits, which schedules as an 8+3 two-wave tail on 8
    cores and caps local[32] at 11-way parallelism outright — measured as
    the single largest scaling-efficiency loss in the round-4 stage
    profile (BENCH.md). Sizing splits to the input (cluster analogue:
    Iceberg ``read.split.target-size`` per table) keeps wave quantization
    ≤ 1/waves at every parallelism level. No-op for non-file-backed
    frames.

    Returns the PREVIOUS ``maxPartitionBytes`` value when the conf was
    changed (``None`` otherwise) so long-lived sessions (SearchAPI,
    streaming drivers) can restore it after the build — a small-table
    build would otherwise pin tiny splits on every later scan of a large
    table."""
    import os as _os

    try:
        files = df.inputFiles()
    except Exception:
        return None
    total = 0
    for f in files:
        try:
            total += _os.path.getsize(local_path(f))
        except OSError:
            return None
    if total <= 0:
        return None
    cores = spark.sparkContext.defaultParallelism
    target = max(
        1 * 1024 * 1024, min(16 * 1024 * 1024, total // max(1, waves * cores))
    )
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    return prior


def restore_file_splits(spark: SparkSession, prior: str | None) -> None:
    """Undo :func:`tune_file_splits` (no-op when it made no change)."""
    if prior is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
