"""Structured-Streaming incremental index: micro-batch ingest + compaction
equals a batch build over the same pages (SURVEY.md §2.8)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk
from webindex.streaming import IncrementalIndexer


def test_incremental_equals_batch(spark, tmp_path):
    pdf = make_pages_pdf(0, 120)
    src = str(tmp_path / "src")
    # two "crawl segments" arriving as separate files
    spark.createDataFrame(pdf.iloc[:70]).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(pdf.iloc[70:]).coalesce(1).write.mode("append").parquet(src)

    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    q = indexer.start(src, trigger_available_now=True)
    q.awaitTermination(120)
    inc_idx = indexer.compact()

    batch_idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="html", doc_id_method="hash"
    )

    assert inc_idx.n_docs == batch_idx.n_docs
    assert abs(inc_idx.avgdl - batch_idx.avgdl) < 1e-9

    for query in ("the data", "w199", "index query"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in topk(inc_idx, query, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in topk(batch_idx, query, 10).collect()]
        assert a == b, query


def test_recrawled_url_collapses(spark, tmp_path):
    """Same url in two batches -> one doc after compaction (doc_id is
    url-derived; late/duplicate data semantics)."""
    pdf = make_pages_pdf(0, 30)
    src = str(tmp_path / "src2")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(pdf.iloc[:10]).coalesce(1).write.mode("append").parquet(src)

    indexer = IncrementalIndexer(spark, str(tmp_path / "inc2"), text_col="html")
    q = indexer.start(src)
    q.awaitTermination(120)
    idx = indexer.compact()
    assert idx.n_docs == 30
