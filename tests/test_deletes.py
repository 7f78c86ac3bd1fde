"""Document deletes on the incremental index: ES DELETE /_doc and
_delete_by_query analogues (tombstone batches applied physically at
compaction — the Lucene live-docs + segment-merge reclaim model).

Semantics pinned here:
  * delete-then-compact == a batch build that never saw the doc (postings,
    doc_stats, n_docs, avgdl, df — everything shrinks);
  * per doc the latest EVENT wins: crawl-then-delete removes,
    delete-then-recrawl resurrects, both orderings inside one delta;
  * deleting an unknown url is a recorded no-op;
  * applying a tombstone is O(touched buckets), never a corpus rewrite.

reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:175-232 (the ES
backend's index/upsert/bulk surface this engine mirrors; deletes are the
missing verb of that CRUD set)."""

import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.query import lookup_url, topk
from webindex.streaming import IncrementalIndexer


def _topk_list(idx, query, k=10):
    return [(r["doc_id"], round(r["score"], 9)) for r in topk(idx, query, k).collect()]


def _queries():
    return ("the data", "w042 w099", "index query merge")


def _assert_same_index(got, want):
    assert got.n_docs == want.n_docs
    assert abs(got.avgdl - want.avgdl) < 1e-9
    for q in _queries():
        assert _topk_list(got, q) == _topk_list(want, q), q
    g = {(r["term"], r["df"]) for r in got.term_stats.select("term", "df").collect()}
    w = {(r["term"], r["df"]) for r in want.term_stats.select("term", "df").collect()}
    assert g == w


def test_delete_equals_batch_build_without_deleted(spark, tmp_path):
    pdf = make_pages_pdf(0, 140)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    assert idx0.n_docs == 140

    victims = list(pdf["url"].iloc[5:15])
    idx1 = indexer.delete(victims)

    survivors = pdf[~pdf["url"].isin(victims)]
    batch_idx = build_index(
        spark, spark.createDataFrame(survivors), text_col="html",
        doc_id_method="hash",
    )
    assert idx1.n_docs == 130
    _assert_same_index(idx1, batch_idx)
    # the deleted doc is gone from point lookups too
    assert lookup_url(idx1, victims[0]).count() == 0


def test_delete_before_first_compact_full_path(spark, tmp_path):
    """Tombstones present when the FIRST (full) compact runs: the full path
    must apply them, not just the incremental one."""
    pdf = make_pages_pdf(0, 80)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    victims = list(pdf["url"].iloc[:7])
    idx = indexer.delete(victims, compact_now=False)
    assert idx is None
    idx = indexer.compact()
    batch_idx = build_index(
        spark,
        spark.createDataFrame(pdf[~pdf["url"].isin(victims)]),
        text_col="html",
        doc_id_method="hash",
    )
    _assert_same_index(idx, batch_idx)


def test_delete_then_recrawl_resurrects(spark, tmp_path):
    pdf = make_pages_pdf(0, 60)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    indexer.compact()

    url = pdf["url"].iloc[3]
    idx = indexer.delete([url])
    assert idx.n_docs == 59
    assert lookup_url(idx, url).count() == 0

    # recrawl the same url (newer batch) -> the doc is live again
    idx2 = indexer.upsert(spark.createDataFrame(pdf.iloc[3:4]))
    assert idx2.n_docs == 60
    assert lookup_url(idx2, url).count() == 1
    batch_idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="html", doc_id_method="hash"
    )
    _assert_same_index(idx2, batch_idx)


def test_crawl_and_delete_in_one_delta_latest_event_wins(spark, tmp_path):
    """Crawl (batch N) then delete (batch N+1) applied by ONE compact: the
    delete is newer, the doc must not appear even though its runs are in the
    same delta window."""
    pdf = make_pages_pdf(0, 50)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf.iloc[:40]).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    indexer.compact()

    # delta: 10 new docs ingested, then 2 of them deleted, then ONE compact
    new = pdf.iloc[40:]
    indexer.upsert(spark.createDataFrame(new), compact_now=False)
    victims = list(new["url"].iloc[:2])
    idx = indexer.delete(victims)

    batch_idx = build_index(
        spark,
        spark.createDataFrame(pdf[~pdf["url"].isin(victims)]),
        text_col="html",
        doc_id_method="hash",
    )
    assert idx.n_docs == 48
    _assert_same_index(idx, batch_idx)


def test_delete_unknown_url_is_noop(spark, tmp_path):
    pdf = make_pages_pdf(0, 30)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    before = _topk_list(idx0, "the data")
    idx1 = indexer.delete(["https://never-crawled.example/x"])
    assert idx1.n_docs == 30
    assert _topk_list(idx1, "the data") == before


def test_delete_by_query_matches_snapshot(spark, tmp_path):
    pdf = make_pages_pdf(0, 90)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    indexer = IncrementalIndexer(spark, str(tmp_path / "inc"), text_col="html")
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()

    from webindex.aggs import matching_doc_ids

    victims = {r["doc_id"] for r in matching_doc_ids(idx0, "w042").collect()}
    assert victims  # fixture must actually match something
    # capture the snapshot BEFORE the delete swaps the table files out
    stats_before = idx0.doc_stats.select("doc_id", "url").collect()
    idx1 = indexer.delete_by_query("w042")
    assert idx1.n_docs == 90 - len(victims)
    # no surviving doc matches the query any more
    assert matching_doc_ids(idx1, "w042").count() == 0
    # and df/scores reflect the shrunken corpus exactly
    surviving_urls = {r["url"] for r in stats_before if r["doc_id"] not in victims}
    batch_pdf = pdf[pdf["url"].isin(surviving_urls)]
    batch_idx = build_index(
        spark, spark.createDataFrame(batch_pdf), text_col="html",
        doc_id_method="hash",
    )
    _assert_same_index(idx1, batch_idx)


def test_delete_is_o_touched_buckets(spark, tmp_path):
    """Tombstoning one doc must decode/rewrite only that doc's bucket."""
    pdf = make_pages_pdf(0, 160)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    workdir = str(tmp_path / "inc")
    indexer = IncrementalIndexer(spark, workdir, text_col="html", range_width=16)
    indexer.start(src).awaitTermination(120)
    idx0 = indexer.compact()
    all_buckets = idx0.postings.select("bucket").distinct().count()
    assert all_buckets > 4

    indexer.delete([pdf["url"].iloc[0]])
    comp = spark.read.parquet(f"{workdir}/compactions").collect()
    inc = [r for r in comp if r["kind"] == "incremental"]
    assert len(inc) == 1
    assert inc[0]["touched_buckets"] == 1


def test_delete_on_positional_workdir_via_open(spark, tmp_path):
    """Review regression: attaching to a positional workdir without knowing
    its layout (IncrementalIndexer.open) must adopt positions=True and let
    deletes compact instead of raising the layout-mismatch error."""
    pdf = make_pages_pdf(0, 40)
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text", positions=True)
    idx0 = ing.upsert(spark.createDataFrame(pdf))
    victim = pdf["url"][0]
    opened = IncrementalIndexer.open(spark, wd, text_col="text")
    assert opened.positions is True
    idx1 = opened.delete([victim])
    assert idx1.n_docs == idx0.n_docs - 1
    assert lookup_url(idx1, victim).count() == 0
    # positions survived: a phrase query still runs on the compacted index
    assert "positions" in idx1.postings.columns


def test_live_index_delete_visible_before_compact(spark, tmp_path):
    """Round-5 query-time tombstone visibility: a pending delete disappears
    from top-k via live_index() BEFORE any compaction runs — with the
    pre-delete corpus stats (Lucene live-docs semantics: results exclude
    dead docs, n_docs/avgdl/df unchanged until the merge). Parity: after
    the physical compact the dead doc stays gone."""
    pdf = make_pages_pdf(0, 60)
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    idx0 = ing.upsert(spark.createDataFrame(pdf))
    q = "the data"
    before = _topk_list(idx0, q, 10)
    assert len(before) == 10
    # delete the TOP doc of the query — the strongest displacement case
    top_doc = before[0][0]
    url = idx0.doc_stats.filter(F.col("doc_id") == top_doc).collect()[0]["url"]
    ing.delete([url], compact_now=False)

    live = ing.live_index()
    # stats are the PRE-delete stats (delete pending, merge not run)
    assert live.n_docs == idx0.n_docs and abs(live.avgdl - idx0.avgdl) < 1e-12
    got = _topk_list(live, q, 10)
    # exactly the pre-delete ranking minus the dead doc, scores unchanged
    # (same stats), with the next-ranked doc promoted into the k-th slot
    want = [(d, s) for d, s in _topk_list(idx0, q, 11) if d != top_doc][:10]
    assert got == want
    assert all(d != top_doc for d, _ in got)

    # the same queries through every fused-scorer entry point agree
    from webindex.query import topk_exact, topk_match, topk_wand

    wand = [(r["doc_id"], round(r["score"], 9)) for r in topk_wand(live, q, 10).collect()]
    exact = [(r["doc_id"], round(r["score"], 9)) for r in topk_exact(live, q, 10).collect()]
    assert wand == got and exact == got
    m = [(r["doc_id"], round(r["score"], 9)) for r in topk_match(live, q, k=10).collect()]
    assert all(d != top_doc for d, _ in m)

    # compaction parity: physically applied, doc stays gone; a fresh batch
    # build over the surviving corpus agrees completely
    idx1 = ing.compact()
    assert all(d != top_doc for d, _ in _topk_list(idx1, q, 10))
    survivors = pdf[pdf["url"] != url]
    want_idx = build_index(
        spark, spark.createDataFrame(survivors), text_col="text",
        doc_id_method="hash",
    )
    _assert_same_index(idx1, want_idx)


def test_live_index_no_pending_deletes_is_plain_index(spark, tmp_path):
    pdf = make_pages_pdf(0, 20)
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    idx0 = ing.upsert(spark.createDataFrame(pdf))
    live = ing.live_index()
    assert live.dead_ids is None
    assert _topk_list(live, "the data") == _topk_list(idx0, "the data")


def test_live_index_bool_pinned_exclude_deleted(spark, tmp_path):
    """Pending tombstones apply to EVERY query family on live_index(), not
    just the WAND kernel: bool (scored, and the must_not-only match_all
    path) and pinned must drop the dead doc before any compact."""
    from webindex.query import topk_bool, topk_pinned

    pdf = make_pages_pdf(0, 60)
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    idx0 = ing.upsert(spark.createDataFrame(pdf))
    q = "the data"
    before = [(r["doc_id"], round(r["score"], 9))
              for r in topk_bool(idx0, must=q).collect()]
    top_doc = before[0][0]
    url = idx0.doc_stats.filter(F.col("doc_id") == top_doc).collect()[0]["url"]
    ing.delete([url], compact_now=False)
    live = ing.live_index()

    got = [(r["doc_id"], round(r["score"], 9))
           for r in topk_bool(live, must=q).collect()]
    want = [(d, s) for d, s in
            [(r["doc_id"], round(r["score"], 9))
             for r in topk_bool(idx0, must=q, k=11).collect()]
            if d != top_doc][:10]
    assert got == want and all(d != top_doc for d, _ in got)

    # must_not-only path enumerates doc_stats — dead doc must not appear
    mn = [r["doc_id"] for r in
          topk_bool(live, must_not="zzzabsent", k=1000).collect()]
    assert top_doc not in mn and len(mn) == 59

    # a pinned deleted doc must not be resurrected
    pinned = [r["doc_id"] for r in topk_pinned(live, [top_doc], q).collect()]
    assert top_doc not in pinned


def test_delete_on_fresh_workdir_is_recorded_noop(spark, tmp_path):
    """delete()/delete_by_query() before any ingest: the documented
    recorded no-op — no crash compacting a corpus that does not exist, and
    a LATER crawl outranks the early tombstone (batch order)."""
    wd = str(tmp_path / "wd")
    ing = IncrementalIndexer(spark, wd, text_col="text")
    pdf = make_pages_pdf(0, 10)
    url0 = pdf["url"].iloc[0]
    assert ing.delete([url0]) is None  # compact_now=True: still a no-op
    assert ing.delete_by_query("the data") is None
    with pytest.raises(ValueError, match="no ingested pages"):
        ing.compact()
    # the tombstone is committed but the crawl is the LATER event: doc lives
    idx = ing.upsert(spark.createDataFrame(pdf))
    assert idx.n_docs == 10
    assert lookup_url(idx, url0).count() == 1
