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


def _topk_list(idx, query, k=10):
    return [(r["doc_id"], round(r["score"], 9)) for r in topk(idx, query, k).collect()]


def test_incremental_compact_merges_only_touched_buckets(spark, tmp_path):
    """Second micro-batch -> compact() must (a) equal a fresh batch build on
    the latest corpus, (b) decode only the touched buckets' old blocks —
    O(delta), never a reshuffle of the full runs history."""
    pdf = make_pages_pdf(0, 160)
    src = str(tmp_path / "src3")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    workdir = str(tmp_path / "inc3")
    indexer = IncrementalIndexer(spark, workdir, text_col="html", range_width=16)
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    total_blocks = idx0.postings.count()
    all_buckets = idx0.postings.select("bucket").distinct().count()
    assert all_buckets > 4  # the bucket isolation below needs several shards

    # delta: 12 new pages in a second file -> a second micro-batch
    pdf2 = make_pages_pdf(160, 172)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(src)
    indexer.start(src).awaitTermination(120)
    idx1 = indexer.compact()

    batch_idx = build_index(
        spark,
        spark.createDataFrame(make_pages_pdf(0, 172)),
        text_col="html",
        doc_id_method="hash",
    )
    assert idx1.n_docs == batch_idx.n_docs == 172
    assert abs(idx1.avgdl - batch_idx.avgdl) < 1e-9
    for q in ("the data", "w42 w99", "index query merge"):
        assert _topk_list(idx1, q) == _topk_list(batch_idx, q), q

    comp = spark.read.parquet(f"{workdir}/compactions").collect()
    inc = [r for r in comp if r["kind"] == "incremental"]
    assert len(inc) == 1
    # merge input is bounded by the touched buckets, not the corpus
    assert 0 < inc[0]["touched_buckets"] < all_buckets
    decoded_ratio = inc[0]["decoded_old_rows"] / max(1, total_blocks * 128)
    assert inc[0]["decoded_old_rows"] > 0 and decoded_ratio < 1.0
    # untouched bucket dirs were not rewritten: their blocks must persist
    # byte-identically (block ids are layout-stable)
    assert idx1.postings.count() >= total_blocks


def test_recrawl_latest_wins_no_hybrid_doc(spark, tmp_path):
    """A re-crawled url must be searchable ONLY by its newest content:
    stale terms vanish, doc_len/avgdl reflect the new text (regression for
    the dropDuplicates hybrid-document bug)."""
    import pandas as pd

    def pages(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": pd.to_datetime([r[1] for r in rows]),
                    "html": [f"<html><body>{r[2]}</body></html>".encode() for r in rows],
                    "text": [r[2] for r in rows],
                    "lang": ["en"] * len(rows),
                }
            )
        )

    src = str(tmp_path / "src4")
    pages(
        [("https://x.example/a", "2024-01-01", "alpha beta"),
         ("https://x.example/b", "2024-01-01", "delta epsilon zeta")]
    ).coalesce(1).write.mode("append").parquet(src)
    workdir = str(tmp_path / "inc4")
    indexer = IncrementalIndexer(spark, workdir, text_col="html")
    indexer.start(src).awaitTermination(120)
    indexer.compact()

    # re-crawl of /a with entirely new content, as a second micro-batch
    pages([("https://x.example/a", "2024-02-01", "beta gamma gamma")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    indexer.start(src).awaitTermination(120)
    idx = indexer.compact()

    assert idx.n_docs == 2
    assert abs(idx.avgdl - (3 + 3) / 2) < 1e-9
    assert topk(idx, "alpha").count() == 0  # stale term is gone
    hits = {r["doc_id"] for r in topk(idx, "gamma").collect()}
    assert len(hits) == 1
    stats = {r["url"]: r["doc_len"] for r in idx.doc_stats.collect()}
    assert stats["https://x.example/a"] == 3  # not 2, not a 2/3 hybrid


def test_single_doc_upsert(spark, tmp_path):
    """S8 upsert: one-doc micro-batch + immediate compact equals a batch
    build over the union."""
    pdf = make_pages_pdf(0, 40)
    src = str(tmp_path / "src5")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc5"), text_col="html")
    indexer.start(src).awaitTermination(120)
    indexer.compact()

    one = make_pages_pdf(40, 41)
    idx = indexer.upsert(spark.createDataFrame(one))
    batch_idx = build_index(
        spark,
        spark.createDataFrame(make_pages_pdf(0, 41)),
        text_col="html",
        doc_id_method="hash",
    )
    assert idx.n_docs == batch_idx.n_docs == 41
    assert abs(idx.avgdl - batch_idx.avgdl) < 1e-9
    for q in ("the data", "w40"):
        assert _topk_list(idx, q) == _topk_list(batch_idx, q), q


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
