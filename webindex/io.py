"""Table writer seam: parquet today, Iceberg with one config flip.

The north rule's production deployment stores the index tables as Iceberg;
this sandbox has no Iceberg runtime jar, so the default writes the SAME
layout (sorted-within-partition, optionally dir-partitioned) as plain
parquet. Every property the engine relies on maps 1:1:

  parquet (sandbox)                     Iceberg (production)
  ------------------------------------  ----------------------------------
  sortWithinPartitions(...).parquet()   WRITE ORDERED BY (...)  [metadata
                                        sampling — avoids the range-sample
                                        double-execution documented in
                                        build.build_index]
  .partitionBy("bucket")                PARTITIONED BY (bucket)
  dynamic partitionOverwriteMode        overwritePartitions()
  streaming._swap_partition_dirs        RewriteFiles / overwrite-partitions
                                        snapshot commit
  latest-crawl-wins compact             MERGE INTO index USING delta
                                        ON doc_id WHEN MATCHED ...

Use  fmt="iceberg"  (or WEBINDEX_TABLE_FORMAT=iceberg) once a catalog is
configured (spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog);
without the runtime the call fails loudly with setup guidance instead of
silently writing the wrong format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def table_format() -> str:
    return os.environ.get("WEBINDEX_TABLE_FORMAT", "parquet")


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    dest: str,
    *,
    sort_cols: list[str] | None = None,
    partition_by: str | None = None,
    fmt: str | None = None,
) -> None:
    """Write an index table with the engine's layout guarantees.

    dest is a filesystem path for parquet, a catalog table name for iceberg.
    sort_cols: clustering for row-group/file pruning. Both formats get it
    per-write via sortWithinPartitions (this write's files are clustered);
    the DataFrameWriterV2 API cannot register a TABLE-level sort order, so
    on iceberg run `ALTER TABLE <dest> WRITE ORDERED BY (<sort_cols>)` once
    after creation to make the clustering binding for OTHER writers and
    compactions too — without it only writes through this function are
    clustered."""
    fmt = fmt or table_format()
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    if fmt == "parquet":
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(dest)
        return
    if fmt == "iceberg":
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                "WEBINDEX_TABLE_FORMAT=iceberg but the Iceberg runtime is not "
                "on the classpath. Add iceberg-spark-runtime to spark.jars and "
                "configure spark.sql.catalog.<name>=org.apache.iceberg.spark."
                "SparkCatalog; dest must then be a catalog table name."
            )
        w = df.writeTo(dest).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(F.col(partition_by))
        w.createOrReplace()
        return
    raise ValueError(f"unknown table format: {fmt}")


def read_table(spark, dest: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or table_format()
    if fmt == "parquet":
        return spark.read.parquet(dest)
    if fmt == "iceberg":
        return spark.read.table(dest)
    raise ValueError(f"unknown table format: {fmt}")
