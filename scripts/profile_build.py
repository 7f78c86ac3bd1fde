"""Phase-level timing of build_index + per-query job breakdown (guide §1).

Replicates build_index's PRE-round-6 serial sequence with timers around
each Spark action so the fixed-overhead structure is visible (this is the
profile that motivated the round-6 overlapped tail; build_index itself now
runs the chains concurrently). Usage:
    python scripts/profile_build.py [sf_dir] [n_synth]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_synth = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from webindex import schema
    from webindex.bm25 import DEFAULT
    from webindex.build import (
        adaptive_range_width, assert_no_docid_collisions,
        assert_no_hash_collisions, assign_doc_ids, build_doc_stats,
        build_postings, build_runs, build_term_grams, hash_bucket_bits,
        resolve_term_hashes, term_hash_expr, url_index_projection,
        vocab_and_corpus_agg, N_URL_BUCKETS, _with_idf,
    )
    from webindex.io import read_table, write_table
    from webindex.pagesgen import generate_pages_df
    from webindex.session import get_spark

    spark = get_spark(app="profile-build", master=f"local[{cpus}]", driver_mem="48g")
    workdir = tempfile.mkdtemp(prefix="webindex_prof_")
    t_all = time.monotonic()
    marks: list[tuple[str, float]] = []

    def mark(name: str, t0: float) -> None:
        marks.append((name, time.monotonic() - t0))

    try:
        generate_pages_df(spark, n_synth).write.mode("overwrite").parquet(
            f"{workdir}/pages_synth"
        )
        pages = spark.read.parquet(f"{workdir}/pages_synth")
        print(f"--- synth pages written ({time.monotonic()-t_all:.1f}s setup)")
        out_dir = f"{workdir}/idx"
        t_build = time.monotonic()

        pages = assign_doc_ids(pages, "hash")
        runs = build_runs(pages, text_col="html")
        t0 = time.monotonic()
        runs.write.mode("overwrite").parquet(f"{out_dir}/runs")
        mark("runs_write (tokenize pass)", t0)
        runs = spark.read.parquet(f"{out_dir}/runs")

        doc_stats = build_doc_stats(pages, runs)
        t0 = time.monotonic()
        vocab_df, vocab_handle, n_docs, avgdl = vocab_and_corpus_agg(runs)
        mark("vocab_agg + collect", t0)
        range_width = adaptive_range_width(n_docs)

        t0 = time.monotonic()
        _, hash_remap = resolve_term_hashes(vocab_df)
        mark("resolve_term_hashes", t0)
        term_stats = _with_idf(
            vocab_df.withColumn("term_hash", term_hash_expr(F.col("term"), hash_remap)),
            n_docs,
        )
        postings = build_postings(
            runs, avgdl, DEFAULT, range_width, n_docs=n_docs, id_space="hash",
            hash_remap=hash_remap,
        )
        t0 = time.monotonic()
        write_table(postings, f"{out_dir}/postings", sort_cols=["term_hash", "block_id"])
        mark("postings write (shuffle+encode)", t0)

        t0 = time.monotonic()
        write_table(term_stats, f"{out_dir}/term_stats", sort_cols=["term"])
        mark("term_stats write", t0)
        t0 = time.monotonic()
        assert_no_hash_collisions(read_table(spark, f"{out_dir}/term_stats"))
        mark("assert_no_hash_collisions", t0)
        t0 = time.monotonic()
        write_table(
            build_term_grams(read_table(spark, f"{out_dir}/term_stats")),
            f"{out_dir}/term_grams", sort_cols=["gram"],
        )
        mark("term_grams write", t0)
        t0 = time.monotonic()
        write_table(doc_stats, f"{out_dir}/doc_stats", sort_cols=["doc_id"])
        mark("doc_stats write", t0)
        t0 = time.monotonic()
        doc_stats = assert_no_docid_collisions(read_table(spark, f"{out_dir}/doc_stats"))
        mark("assert_no_docid_collisions", t0)
        t0 = time.monotonic()
        write_table(
            url_index_projection(doc_stats).repartition(N_URL_BUCKETS, F.col("url_bucket")),
            f"{out_dir}/url_index", sort_cols=["url_hash"], partition_by="url_bucket",
        )
        mark("url_index write", t0)
        t0 = time.monotonic()
        write_table(
            spark.createDataFrame([(n_docs, avgdl, -1)], schema=schema.CORPUS_STATS),
            f"{out_dir}/corpus_stats",
        )
        write_table(
            spark.createDataFrame(
                [(DEFAULT.k1, DEFAULT.b, DEFAULT.block_size, DEFAULT.quantize_norms,
                  range_width, "hash")],
                schema=schema.INDEX_CONF,
            ),
            f"{out_dir}/conf",
        )
        mark("corpus_stats + conf writes", t0)
        vocab_handle.unpersist()
        total_build = time.monotonic() - t_build
        print(f"\nbuild phases (n_docs={n_docs}):")
        for name, dt in marks:
            print(f"  {name:34s} {dt:7.2f}s")
        print(f"  {'TOTAL build':34s} {total_build:7.2f}s  (sum {sum(d for _, d in marks):.2f})")

        # ---- query breakdown -------------------------------------------
        from webindex.build import load_index
        from webindex.query import _maps_of, _query_terms, _run_scored, topk_wand

        idx = load_index(spark, out_dir)
        topk_wand(idx, "warmup run", 10).collect()
        for q in ["the data spark", "w180", "index query search"]:
            best = (1e9, None)
            for _ in range(3):
                t0 = time.monotonic()
                stats = _query_terms(idx, q)
                t1 = time.monotonic()
                if stats:
                    idf_map, term_rank = _maps_of(stats)
                    _run_scored(idx, idf_map, term_rank, 10, 0.0).collect()
                t2 = time.monotonic()
                if t2 - t0 < best[0]:
                    best = (t2 - t0, (t1 - t0, t2 - t1))
            print(f"query {q!r}: total {best[0]:.3f}s = stats {best[1][0]:.3f} + score {best[1][1]:.3f}")
        # file counts of the index tables
        for t in ["postings", "term_stats", "term_grams", "doc_stats", "url_index"]:
            n = sum(1 for p in Path(f"{out_dir}/{t}").rglob("*.parquet"))
            print(f"files {t}: {n}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
