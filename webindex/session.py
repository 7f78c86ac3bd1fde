"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        path = os.path.join(shm, "spark-local")
        os.makedirs(path, exist_ok=True)
        return path
    return os.environ.get("SPARK_LOCAL_DIRS", "/tmp")


def get_spark(
    app: str = "webindex",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str = "16g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # size shuffle partitions for DATA, not cores: undersized partitions
        # make the per-partition shuffle sort spill superlinearly (measured
        # 3.7x on the postings stage at 90M rows / 32 partitions). AQE
        # coalesces the excess away for small stages.
        shuffle_partitions = 256
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE coalesce shuffles UNDER persisted frames too (off by
        # default): the build's vocab aggregate is persisted, and without
        # this every consumer pass over the cache schedules the full
        # spark.sql.shuffle.partitions task count (256 tasks per pass at
        # any data size — pure fixed overhead on small/medium corpora)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k rows/batch is ~100MB of transient python-worker memory
        # per batch on multi-KB web pages; with one worker per core that
        # inverts scaling at high core counts (allocator/membw thrash)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # CPU-per-byte of the extract+tokenize scan is ~2 orders above a
        # plain columnar scan, so the default 128MB input split starves
        # cores: 300k web-like docs = ~2GB of pages = ~15 splits -> a
        # 32-core "cluster" runs its hottest stage at half occupancy
        # (measured: tokenize sped up 1.09x from 8->32 cores at 128MB,
        # 2.44x at 16MB; local[32] build total -35%). 16MB keeps ~4
        # tasks/core at this corpus size and
        # costs nothing JVM-side; on S3 at 100TB, raise it back toward
        # 64-128MB per the executor count so request overhead stays amortized.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # shuffle/spill on tmpfs when available: the rootfs here mounts with
        # inline `discard` (TRIM per unlink) — Spark's many short-lived
        # shuffle files turn that into a kernel-time storm (observed 96% sys)
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
    )
    for key, val in (extra or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
