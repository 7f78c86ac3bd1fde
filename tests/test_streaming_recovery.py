"""Crash/ordering hardening of the incremental index (round-4 review):
engine-epoch vs synthetic-batch decoupling, ghost doc_stats rows in emptied
buckets, the interrupted-compact fence, n_buckets pinning on the resumable
build, caller-supplied doc_id rejection, and conf restore on full compacts."""

import pytest
from pyspark.sql import functions as F

from webindex.bm25 import BM25Config
from webindex.pagesgen import make_pages_pdf
from webindex.query import lookup_url, topk
from webindex.streaming import IncrementalIndexer


def _pages(spark, lo, hi):
    pdf = make_pages_pdf(lo, hi)  # [lo, hi) doc indices
    return spark.createDataFrame(pdf)


def test_engine_epoch_decoupled_from_synthetic_batches(spark, tmp_path):
    """An engine epoch that numerically collides with a synthetic (upsert)
    batch id must still be ingested — and a genuinely redelivered epoch must
    be skipped."""
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    # engine delivers epoch 0
    ing._process_batch(_pages(spark, 0, 10), 0)
    # synthetic upsert takes internal batch id 1
    ing.upsert(_pages(spark, 100, 101), compact_now=False)
    # a restarted stream's next epoch is 1 — same number as the synthetic
    # batch. It carries NEW pages and must not be dropped as a redelivery.
    ing._process_batch(_pages(spark, 10, 20), 1)
    idx = ing.compact()
    assert idx.n_docs == 21
    # redelivery of epoch 1 (same engine epoch) IS skipped
    ing._process_batch(_pages(spark, 10, 20), 1)
    assert ing._next_batch_id() == 3  # no new batch was written


def test_emptied_bucket_leaves_no_ghost_doc_stats(spark, tmp_path):
    """Deleting every doc then re-deleting must not double-decrement
    n_docs/sum_dl via ghost doc_stats rows in emptied buckets."""
    pdf = make_pages_pdf(0, 6)
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    idx0 = ing.upsert(spark.createDataFrame(pdf))
    assert idx0.n_docs == 6
    urls = list(pdf["url"])
    idx1 = ing.delete(urls[:3])
    assert idx1.n_docs == 3
    # ghost check: doc_stats must hold exactly the 3 survivors
    assert idx1.doc_stats.count() == 3
    # delete the same urls again (recorded no-op): counts must NOT move
    idx2 = ing.delete(urls[:3])
    assert idx2.n_docs == 3 and idx2.doc_stats.count() == 3
    assert abs(idx2.avgdl - idx1.avgdl) < 1e-12


def test_interrupted_compact_fence(spark, tmp_path):
    """A leftover _compact_pending marker makes incremental compaction fail
    loudly; compact(full=True) rebuilds from the runs history and clears it."""
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    ing.upsert(_pages(spark, 0, 8))
    ing.upsert(_pages(spark, 8, 12), compact_now=False)
    (tmp_path / "wd" / "_compact_pending").mkdir()
    with pytest.raises(RuntimeError, match="interrupted"):
        ing.compact()
    idx = ing.compact(full=True)
    assert idx.n_docs == 12
    assert not (tmp_path / "wd" / "_compact_pending").exists()
    # incremental path usable again
    idx2 = ing.upsert(_pages(spark, 12, 13))
    assert idx2.n_docs == 13


def test_resumable_build_pins_n_buckets(spark, tmp_path):
    from webindex.checkpoint import build_runs_checkpointed

    pdf = make_pages_pdf(0, 30)
    pages = spark.createDataFrame(pdf)
    wd = str(tmp_path / "ckpt")
    build_runs_checkpointed(
        spark, pages, wd, n_buckets=8, chunk_buckets=4, text_col="text",
        max_chunks=1,
    )
    with pytest.raises(ValueError, match="n_buckets"):
        build_runs_checkpointed(
            spark, pages, wd, n_buckets=16, chunk_buckets=4, text_col="text"
        )
    # the committed value resumes fine
    build_runs_checkpointed(
        spark, pages, wd, n_buckets=8, chunk_buckets=4, text_col="text"
    )


def test_upsert_drops_caller_doc_id(spark, tmp_path):
    """A caller-supplied doc_id must not leak into the index: identity is
    xxhash64(url), otherwise tombstones miss and recrawls never collapse."""
    pdf = make_pages_pdf(0, 4)
    df = spark.createDataFrame(pdf).withColumn("doc_id", F.lit(777))
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    idx = ing.upsert(df)
    url = pdf["url"][0]
    row = lookup_url(idx, url).collect()
    assert len(row) == 1 and row[0]["doc_id"] != 777
    # and the doc is deletable by url
    idx2 = ing.delete([url])
    assert idx2.n_docs == 3


def test_full_compact_restores_persisted_conf(spark, tmp_path):
    """compact(full=True) must re-encode with the conf the index was built
    with, not the constructor default."""
    wd = str(tmp_path / "wd")
    conf = BM25Config(k1=0.5, b=0.3)
    ing = IncrementalIndexer(spark, wd, text_col="text", conf=conf)
    idx0 = ing.upsert(_pages(spark, 0, 12))
    before = [(r["doc_id"], round(r["score"], 9)) for r in topk(idx0, "data", 5).collect()]
    opened = IncrementalIndexer.open(spark, wd, text_col="text")  # default conf
    idx1 = opened.compact(full=True)
    assert opened.conf.k1 == 0.5 and opened.conf.b == 0.3
    after = [(r["doc_id"], round(r["score"], 9)) for r in topk(idx1, "data", 5).collect()]
    assert after == before


def test_finish_tables_crash_window_recovers(spark, tmp_path):
    """Crash injection for the _finish_tables commit window (round-4 verdict
    item): a crash between rename(term_stats -> _term_stats_old) and
    rename(staging -> term_stats) leaves _term_stats_old as the ONLY
    surviving table. The next compact (via _recover_term_stats at entry)
    must restore it and proceed without manual intervention."""
    import shutil

    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    ing.upsert(_pages(spark, 0, 12), compact_now=False)
    idx0 = ing.compact()
    baseline = [
        (r["doc_id"], round(r["score"], 9)) for r in topk(idx0, "data", 5).collect()
    ]
    # simulate the exact post-crash FS state: old renamed aside, final
    # missing, staging (the half-committed new table) left behind
    out = f"{wd}/index"
    shutil.move(f"{out}/term_stats", f"{out}/_term_stats_old")
    shutil.copytree(f"{out}/_term_stats_old", f"{out}/_term_stats_staging")
    reopened = IncrementalIndexer.open(spark, wd, text_col="text")
    idx1 = reopened.compact()  # no-op delta; must restore term_stats first
    after = [
        (r["doc_id"], round(r["score"], 9)) for r in topk(idx1, "data", 5).collect()
    ]
    assert after == baseline
    # and a further incremental ingest + compact over the recovered table works
    reopened.upsert(_pages(spark, 12, 18), compact_now=False)
    idx2 = reopened.compact()
    assert idx2.n_docs == 18
    assert len(topk(idx2, "data", 5).collect()) == 5
