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
    coalesce: int | None = None,
) -> None:
    """Write an index table with the engine's layout guarantees.

    dest is a filesystem path for parquet, a catalog table name for iceberg.
    sort_cols: clustering for row-group/file pruning. Both formats get it
    per-write via sortWithinPartitions (this write's files are clustered);
    the DataFrameWriterV2 API cannot register a TABLE-level sort order, so
    on iceberg run `ALTER TABLE <dest> WRITE ORDERED BY (<sort_cols>)` once
    after creation to make the clustering binding for OTHER writers and
    compactions too — without it only writes through this function are
    clustered.

    coalesce: target file count for SMALL dictionary-shaped tables (guide
    §6 small-files). A row-count-derived target (the caller computes it from
    data size, never from cluster size) keeps a point/IN lookup from paying
    one scan task per shuffle partition: an AQE-coalesced agg still emits
    >= defaultParallelism files (parallelismFirst), and N hash-partitioned
    sorted files overlap in key range so none can be file-pruned. coalesce
    happens BEFORE sortWithinPartitions, so the merged partitions are
    re-sorted and row-group pruning stays tight."""
    fmt = fmt or table_format()
    if coalesce is not None:
        # coalesce never increases partition count, so this is a no-op when
        # the frame is already at or below the target
        df = df.coalesce(coalesce)
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


def write_driver_table(
    spark,
    rows: list[tuple],
    schema,
    dest: str,
    fmt: str | None = None,
) -> None:
    """Write a metadata-scale (few-row) table WITHOUT a Spark job.

    The one-row sidecars (corpus_stats, conf) each cost a createDataFrame +
    single-task write job through the normal path — measured ~0.5-1s of pure
    fixed overhead apiece on local[32], charged to every build. For parquet
    the driver writes the file directly with pyarrow (bit-identical types:
    the arrow schema is derived from the Spark StructType, so
    spark.read.parquet round-trips the exact same values and schema); the
    iceberg seam keeps the normal catalog write, where the commit itself is
    the metadata operation."""
    fmt = fmt or table_format()
    scheme_remote = "://" in dest and not dest.startswith("file://")
    if fmt != "parquet" or scheme_remote:
        # iceberg, or a non-local filesystem the driver can't write with
        # pyarrow: keep the ordinary single-task write
        write_table(spark.createDataFrame(rows, schema=schema), dest, fmt=fmt)
        return
    if dest.startswith("file://"):
        dest = dest[len("file://"):]
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    cols = [
        pa.array([r[i] for r in rows], type=arrow_schema.field(i).type)
        for i in range(len(arrow_schema))
    ]
    table = pa.Table.from_arrays(cols, schema=arrow_schema)
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest, exist_ok=True)
    pq.write_table(table, os.path.join(dest, "part-00000.parquet"))


def read_table(spark, dest: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or table_format()
    if fmt == "parquet":
        return spark.read.parquet(dest)
    if fmt == "iceberg":
        return spark.read.table(dest)
    raise ValueError(f"unknown table format: {fmt}")


def append_driver_rows(
    spark,
    rows: list[tuple],
    schema,
    dest: str,
    fmt: str | None = None,
) -> None:
    """Append a metadata-scale (few-row) batch WITHOUT a Spark job.

    The streaming sidecars (lineage, _epoch_map, compactions) append one row
    per micro-batch through createDataFrame + a single-task write job —
    pure fixed job latency on the ingest path. For local parquet the driver
    appends a uniquely-named file with pyarrow (same arrow-schema derivation
    as write_driver_table, so spark.read.parquet sees one coherent table);
    iceberg / remote filesystems keep the ordinary Spark append. The
    single-writer workdir contract makes the non-transactional file add safe.

    `schema` may be a StructType or a DDL string ("a long, b string")."""
    fmt = fmt or table_format()
    scheme_remote = "://" in dest and not dest.startswith("file://")
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if fmt != "parquet" or scheme_remote:
        spark.createDataFrame(rows, schema=schema).write.mode("append").parquet(dest)
        return
    if dest.startswith("file://"):
        dest = dest[len("file://"):]
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    cols = [
        pa.array([r[i] for r in rows], type=arrow_schema.field(i).type)
        for i in range(len(arrow_schema))
    ]
    table = pa.Table.from_arrays(cols, schema=arrow_schema)
    os.makedirs(dest, exist_ok=True)
    pq.write_table(table, os.path.join(dest, f"part-{uuid.uuid4().hex}.parquet"))
