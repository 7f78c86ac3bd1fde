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
