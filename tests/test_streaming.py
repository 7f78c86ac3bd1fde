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


def test_divergent_committed_key_delta_merge(spark, tmp_path):
    """An existing term whose COMMITTED key was remapped at first compact
    (collision resolution) must have its delta rows keyed by the committed
    key, not its primary hash — the primary value is exactly the colliding
    stranger's key, so the old behavior silently merged the two terms'
    postings (ADVICE r2 high). Forced with a coarse primary hash space."""
    from tests.test_collision import coarse_fn

    fn = coarse_fn(8)  # 8-slot space: nearly every term's key is remapped
    pdf = make_pages_pdf(0, 60)
    src = str(tmp_path / "src6")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(
        spark, str(tmp_path / "inc6"), text_col="html", hash_primary_fn=fn
    )
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    # sanity: the full compact really committed remapped (divergent) keys
    from webindex.build import term_hash_col  # noqa: F401 (doc: primary fn)
    n_divergent = idx0.term_stats.filter(
        F.col("term_hash") != fn(F.col("term"))
    ).count()
    assert n_divergent > 0

    # delta re-uses EXISTING vocabulary (same generator -> heavy term overlap,
    # including remapped terms) plus genuinely new docs
    pdf2 = make_pages_pdf(60, 75)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(src)
    indexer.start(src).awaitTermination(120)
    idx1 = indexer.compact()

    batch_idx = build_index(
        spark,
        spark.createDataFrame(make_pages_pdf(0, 75)),
        text_col="html",
        doc_id_method="hash",
        hash_primary_fn=fn,
    )
    assert idx1.n_docs == batch_idx.n_docs == 75
    # key uniqueness survived the merge (no stranger-merge, no split)
    assert (
        idx1.term_stats.select("term_hash").distinct().count()
        == idx1.term_stats.count()
    )
    for q in ("the data", "w42 merge", "index query", "w70"):
        assert _topk_list(idx1, q) == _topk_list(batch_idx, q), q


def test_streaming_lineage_real_metrics(spark, tmp_path):
    """Lineage rows carry REAL postings counts and committed bytes (north
    rule: per-partition lineage + metrics), not placeholder zeros."""
    from webindex.fsutil import dir_bytes

    pdf = make_pages_pdf(0, 25)
    src = str(tmp_path / "src7")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    workdir = str(tmp_path / "inc7")
    indexer = IncrementalIndexer(spark, workdir, text_col="html")
    indexer.start(src).awaitTermination(120)

    rows = spark.read.parquet(f"{workdir}/lineage").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["docs"] == 25
    assert r["postings"] > 25  # several distinct terms per doc
    expected_bytes = dir_bytes(
        spark, f"{workdir}/runs/batch_id={r['partition_id']}"
    ) + dir_bytes(spark, f"{workdir}/doc_urls/batch_id={r['partition_id']}")
    assert r["bytes"] == expected_bytes > 0


def test_streaming_conf_persisted_on_resume(spark, tmp_path):
    """Resuming a workdir restores the BM25Config the blocks were encoded
    with (quantize_norms changes the doc_lens byte format) — the constructor
    default must NOT silently misdecode a quantized index."""
    from webindex.bm25 import BM25Config

    pdf = make_pages_pdf(0, 30)
    src = str(tmp_path / "src8")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    workdir = str(tmp_path / "inc8")
    indexer = IncrementalIndexer(
        spark, workdir, conf=BM25Config(quantize_norms=True), text_col="html"
    )
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    ref = _topk_list(idx0, "the data")
    assert ref

    resumed = IncrementalIndexer(spark, workdir, text_col="html")  # default conf
    idx1 = resumed.compact()  # no new batches -> load via persisted state
    assert resumed.conf.quantize_norms is True  # restored, not the default
    assert _topk_list(idx1, "the data") == ref


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


def test_positions_layout_mismatch_fails_loudly(spark, tmp_path):
    """ADVICE round-4 fix: toggling the positions flag on an existing
    workdir must raise a clear error instead of writing mixed-schema runs
    (which a later full compact would either crash on or silently resolve
    by schema-sampling luck)."""
    import pytest as _pytest

    from webindex.pagesgen import make_pages_pdf
    from webindex.streaming import IncrementalIndexer

    pdf = make_pages_pdf(0, 30)
    workdir = str(tmp_path / "inc")
    indexer = IncrementalIndexer(spark, workdir, text_col="html")
    indexer.upsert(spark.createDataFrame(pdf.iloc[:20]), compact_now=True)

    flipped = IncrementalIndexer(spark, workdir, text_col="html", positions=True)
    with _pytest.raises(ValueError, match="positions"):
        flipped.upsert(spark.createDataFrame(pdf.iloc[20:]), compact_now=False)
    with _pytest.raises(ValueError, match="positions"):
        flipped.compact(full=True)

    # the committed layout still works with the matching flag
    again = IncrementalIndexer(spark, workdir, text_col="html")
    idx = again.upsert(spark.createDataFrame(pdf.iloc[20:]), compact_now=True)
    assert idx.n_docs == 30


def test_checkpoint_reset_does_not_skip_recycled_epochs(spark, tmp_path):
    """ADVICE round-4: _epoch_map is keyed by the checkpoint's query id, so
    resetting/relocating the engine checkpoint (epochs recycle from 0) must
    NOT skip the new stream's first micro-batches as redeliveries."""
    import shutil

    pdf = make_pages_pdf(0, 40)
    src = str(tmp_path / "src_ck")
    spark.createDataFrame(pdf.iloc[:20]).coalesce(1).write.mode("append").parquet(src)

    workdir = str(tmp_path / "inc_ck")
    indexer = IncrementalIndexer(spark, workdir, text_col="html")
    indexer.start(src).awaitTermination(120)
    assert indexer.compact().n_docs == 20

    # reset the engine checkpoint: a fresh stream re-reads the source from
    # scratch and its epochs recycle from 0 under a NEW query id
    shutil.rmtree(f"{workdir}/_stream_ckpt")
    spark.createDataFrame(pdf.iloc[20:]).coalesce(1).write.mode("append").parquet(src)
    indexer2 = IncrementalIndexer.open(spark, workdir, text_col="html")
    indexer2.start(src).awaitTermination(120)
    idx = indexer2.compact()
    # every page ingested exactly once (the re-read of the first 20 collapses
    # via latest-crawl-wins; the new 20 must NOT be dropped as redeliveries)
    assert idx.n_docs == 40


def test_synthetic_events_fenced_while_stream_active(spark, tmp_path):
    """upsert/delete must refuse to race an active stream's batch-id
    allocation (single-writer fence)."""
    workdir = str(tmp_path / "inc_fence")
    indexer = IncrementalIndexer(spark, workdir, text_col="html")

    class _FakeQuery:
        @property
        def isActive(self):
            return True

    indexer._active_query = _FakeQuery()
    with pytest.raises(RuntimeError, match="batch-id"):
        indexer.upsert(spark.createDataFrame(make_pages_pdf(0, 2)))
    with pytest.raises(RuntimeError, match="batch-id"):
        indexer.delete(["https://x.example/1"])
