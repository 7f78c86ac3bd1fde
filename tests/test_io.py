"""Table-format seam: parquet layout round-trips; iceberg fails loudly
without the runtime (no silent wrong-format writes)."""

import pytest

from webindex.io import read_table, write_table


def test_parquet_roundtrip_sorted_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(2, 20, "b"), (1, 10, "a"), (2, 21, "c")], "bucket int, k int, v string"
    )
    dest = str(tmp_path / "t")
    write_table(df, dest, sort_cols=["k"], partition_by="bucket")
    back = read_table(spark, dest)
    assert {(r["bucket"], r["k"], r["v"]) for r in back.collect()} == {
        (2, 20, "b"), (1, 10, "a"), (2, 21, "c")
    }
    # hive partition dirs exist
    assert (tmp_path / "t" / "bucket=1").exists()
    assert (tmp_path / "t" / "bucket=2").exists()


def test_iceberg_without_runtime_raises_with_guidance(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(df, "cat.db.t", fmt="iceberg")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        write_table(spark.range(1), str(tmp_path / "x"), fmt="orcish")


def test_append_driver_rows_roundtrip(spark, tmp_path):
    """Driver-side appended batches read back as ONE coherent Spark table,
    including interleaving with a Spark-written append (the pre-round-6
    layout) — the streaming sidecars rely on exactly this mix."""
    from webindex.io import append_driver_rows

    dest = str(tmp_path / "lineage")
    schema = "batch_id long, status string, secs double"
    spark.createDataFrame([(0, "done", 0.5)], schema).write.mode(
        "append"
    ).parquet(dest)
    append_driver_rows(spark, [(1, "done", 1.5)], schema, dest, fmt="parquet")
    append_driver_rows(spark, [(2, "failed", None)], schema, dest, fmt="parquet")
    back = spark.read.parquet(dest)
    assert back.schema.simpleString() == (
        "struct<batch_id:bigint,status:string,secs:double>"
    )
    assert {(r["batch_id"], r["status"], r["secs"]) for r in back.collect()} == {
        (0, "done", 0.5), (1, "done", 1.5), (2, "failed", None)
    }
