"""Hot-term skew handling: the (term, bucket) salt must spread a df≈N term
across many groups with bounded per-group work, identically at any
parallelism (SURVEY.md §4.1)."""

import numpy as np
from pyspark.sql import functions as F

from webindex.build import adaptive_range_width, bucket_expr, build_index
from webindex.pagesgen import make_pages_pdf


def test_hot_term_spreads_over_buckets(spark):
    pdf = make_pages_pdf(0, 400)
    pdf.insert(0, "doc_id", np.arange(400, dtype=np.int64))
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=64,
    )
    from webindex.build import term_hashes

    h = term_hashes(spark, ["the"])["the"]
    hot = idx.postings.filter(F.col("term_hash") == h)
    rows = hot.collect()
    buckets = {r["bucket"] for r in rows}
    # 'the' is in virtually every doc -> present in every 64-doc bucket
    assert len(buckets) >= 5
    # per-block work is bounded: <= block_size docs, <= range_width per bucket
    assert all(r["n_docs"] <= 128 for r in rows)
    per_bucket = {}
    for r in rows:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n_docs"]
    assert all(v <= 64 for v in per_bucket.values())


def test_bucket_expr_hash_space_balance(spark):
    """Uniform hash ids -> top-bit bucketing gives balanced EXPECTED sizes;
    floor-division would give one bucket per doc."""
    n = 5000
    df = spark.range(n).select(F.xxhash64(F.col("id").cast("string")).alias("doc_id"))
    out = df.select(bucket_expr(F.col("doc_id"), n, 512, "hash").alias("b"))
    counts = [r["cnt"] for r in out.groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()]
    n_buckets = len(counts)
    assert 4 <= n_buckets <= 16  # 5000/512 ≈ 9.8 -> 2^3 or 2^4 buckets
    assert max(counts) < 5 * (n / n_buckets)  # no degenerate bucket


def test_adaptive_range_width_data_derived_only():
    assert adaptive_range_width(500) == 1024          # floor
    assert adaptive_range_width(40_000) == 1024
    assert adaptive_range_width(1_000_000) == 7812
    assert adaptive_range_width(10**12) == 1 << 18    # web-scale cap
