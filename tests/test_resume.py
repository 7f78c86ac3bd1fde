"""Resumability (SURVEY.md §5.4): kill the build after some chunks, restart,
assert the final index equals a clean run's; lineage metrics recorded."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex.checkpoint import build_index_resumable, build_runs_checkpointed, read_lineage
from webindex.pagesgen import make_pages_pdf


def _postings_map(idx):
    return {
        (r["term_hash"], r["block_id"]): (bytes(r["doc_ids"]), bytes(r["tfs"]), r["max_impact"])
        for r in idx.postings.collect()
    }


def test_resume_matches_clean_run(spark, tmp_path):
    pdf = make_pages_pdf(0, 150)
    pages = spark.createDataFrame(pdf)

    clean = build_index_resumable(
        spark, pages, str(tmp_path / "clean"), n_buckets=8, chunk_buckets=2
    )

    # interrupted run: the job "dies" after 2 of 4 chunks (max_chunks budget
    # = how a mid-build crash looks to the lineage table)
    workdir = str(tmp_path / "resumed")
    build_runs_checkpointed(
        spark, pages, workdir, n_buckets=8, chunk_buckets=2, max_chunks=2
    )
    lineage1 = read_lineage(spark, workdir)
    done1 = {r["partition_id"] for r in lineage1.filter(F.col("status") == "done").collect()}
    assert len(done1) == 4  # exactly the first two chunks' buckets

    # resume with the FULL input; finished buckets are skipped
    resumed = build_index_resumable(
        spark, pages, workdir, n_buckets=8, chunk_buckets=2
    )

    assert _postings_map(resumed) == _postings_map(clean)
    assert resumed.n_docs == clean.n_docs
    assert abs(resumed.avgdl - clean.avgdl) < 1e-12

    # resumable builds carry the url_index projection too (same contract as
    # build_index): lookup_url resolves a known url to its doc_id
    from webindex.query import lookup_url

    some = resumed.doc_stats.limit(1).collect()[0]
    got = lookup_url(resumed, some["url"]).collect()
    assert [r["doc_id"] for r in got] == [some["doc_id"]]

    # lineage has one done row per bucket with metrics
    lin = resumed.lineage.filter(F.col("status") == "done").collect()
    assert {r["partition_id"] for r in lin} == set(range(8))
    assert all(r["elapsed_s"] >= 0 for r in lin)
    total_docs = sum(r["docs"] for r in lin)
    assert total_docs == 150

    # bytes metric is REAL: per-bucket lineage bytes == the on-disk size of
    # that bucket's committed run files (north rule: lineage carries metrics,
    # not estimates)
    import os

    for r in lin:
        bdir = f"{workdir}/runs/build_bucket={r['partition_id']}"
        disk = sum(
            os.path.getsize(os.path.join(bdir, f))
            for f in os.listdir(bdir)
            if not f.startswith(("_", "."))
        )
        assert r["bytes"] == disk and disk > 0


def test_second_resume_is_noop_fast(spark, tmp_path):
    pdf = make_pages_pdf(0, 60)
    pages = spark.createDataFrame(pdf)
    workdir = str(tmp_path / "w")
    build_runs_checkpointed(spark, pages, workdir, n_buckets=4, chunk_buckets=2)
    lin1 = read_lineage(spark, workdir).count()
    runs = build_runs_checkpointed(spark, pages, workdir, n_buckets=4, chunk_buckets=2)
    lin2 = read_lineage(spark, workdir).count()
    assert lin1 == lin2  # no new lineage rows — everything skipped
    assert runs.count() > 0


def test_resumable_build_under_pathological_hash(spark, tmp_path):
    """build_index_resumable resolves term-hash collisions PRE-shuffle (same
    contract as build_index): a coarse primary hash space must yield unique
    committed keys and rank-identical queries, not a post-build abort."""
    from tests.test_collision import coarse_fn
    from webindex.build import build_index
    from webindex.query import topk_exact

    pdf = make_pages_pdf(0, 80)
    pages = spark.createDataFrame(pdf)
    idx = build_index_resumable(
        spark, pages, str(tmp_path / "coarse"), n_buckets=4, chunk_buckets=2,
        hash_primary_fn=coarse_fn(32),
    )
    n_vocab = idx.term_stats.count()
    n_keys = idx.term_stats.select("term_hash").distinct().count()
    assert n_keys == n_vocab > 32  # unique despite the 32-slot primary space

    normal = build_index(spark, pages, text_col="html", doc_id_method="hash")
    for q in ("the data", "w42 merge", "index query"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in topk_exact(idx, q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in topk_exact(normal, q, 10).collect()]
        assert a == b, q
