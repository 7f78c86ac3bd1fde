"""Resumable index build: per-chunk checkpointing with lineage + metrics.

The reference gets resumability from its URL file-cache (reference:
src/nmr_FAIR_DOs/utils.py:61-71 — re-runs skip already-fetched URLs) and
incremental windows from a watermark file (lib.py:436-437). Our analogue,
sized for a 100 TB scan:

  * pages are bucketed deterministically by  build_bucket =
    pmod(xxhash64(doc_id), B)  — doc_id is data-derived (url hash), so the
    bucketing is valid across cluster sizes and input repartitionings;
  * buckets are processed in CHUNKS; each chunk is one Spark job that
    (1) dynamic-partition-overwrites its buckets under <workdir>/runs/
        (a re-run of a half-written chunk self-cleans), then
    (2) appends one lineage row per bucket with metrics
        (docs, postings=run rows, bytes, elapsed_s, status='done');
  * resume = skip buckets whose lineage says done. The lineage append
    happens only AFTER the runs write commits, so lineage can understate but
    never overstate progress — the safe direction.

The expensive stage at 100 TB is the tokenize scan of raw html; the
(term,bucket) shuffle into posting blocks reads the checkpointed runs, never
raw pages, so a restart re-tokenizes only unfinished chunks.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from webindex import schema
from webindex.bm25 import BM25Config, DEFAULT
from webindex.build import (
    Index,
    assign_doc_ids,
    build_postings,
    build_runs,
)


def bucket_col(doc_id_col, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(doc_id_col.cast("long")), F.lit(n_buckets)).cast("int")


def read_lineage(spark: SparkSession, workdir: str) -> DataFrame:
    try:
        return spark.read.parquet(f"{workdir}/lineage")
    except Exception:
        return spark.createDataFrame([], schema=schema.LINEAGE)


def build_runs_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    *,
    n_buckets: int = 16,
    chunk_buckets: int = 4,
    text_col: str = "html",
    doc_id_method: str = "hash",
    max_chunks: int | None = None,
) -> DataFrame:
    """Tokenize pages into runs, resumably (see module docstring). Returns
    the runs DataFrame read back from <workdir>/runs (byte-identical across
    resumes). doc_stats' url map is written alongside as <workdir>/doc_urls.

    max_chunks bounds the work done in THIS invocation (budgeted/incremental
    processing; also how tests simulate a mid-build crash) — remaining chunks
    are picked up by the next call."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # pin the bucketing: lineage partition_ids are only meaningful under the
    # n_buckets they were written with — resuming with a different value
    # would silently skip never-tokenized docs (they hash into 'done'
    # buckets) and duplicate already-done ones. The first run records it;
    # every resume must match.
    from webindex.fsutil import path_exists

    meta_path = f"{workdir}/_build_meta"
    if path_exists(spark, meta_path):
        committed = int(
            spark.read.parquet(meta_path).collect()[0]["n_buckets"]
        )
        if committed != n_buckets:
            raise ValueError(
                f"n_buckets={n_buckets} but {workdir} was checkpointed with "
                f"n_buckets={committed}; resume with the committed value "
                "(or use a fresh workdir to re-bucket)"
            )
    else:
        from pyspark.sql import types as T

        from webindex.io import write_driver_table

        write_driver_table(
            spark,
            [(int(n_buckets),)],
            T.StructType([T.StructField("n_buckets", T.IntegerType(), False)]),
            meta_path,
        )
    pages = assign_doc_ids(pages, doc_id_method).withColumn(
        "build_bucket", bucket_col(F.col("doc_id"), n_buckets)
    )

    done = {
        int(r["partition_id"])
        for r in read_lineage(spark, workdir)
        .filter(F.col("status") == "done")
        .select("partition_id")
        .collect()
    }

    chunks_run = 0
    for lo in range(0, n_buckets, chunk_buckets):
        chunk = [b for b in range(lo, min(lo + chunk_buckets, n_buckets)) if b not in done]
        if not chunk:
            continue
        if max_chunks is not None and chunks_run >= max_chunks:
            break
        chunks_run += 1
        t0 = time.monotonic()
        chunk_pages = pages.filter(F.col("build_bucket").isin(chunk))
        runs = build_runs(chunk_pages, text_col=text_col).withColumn(
            "build_bucket", bucket_col(F.col("doc_id"), n_buckets)
        )
        runs.write.mode("overwrite").partitionBy("build_bucket").parquet(
            f"{workdir}/runs"
        )
        chunk_pages.select("doc_id", "url", "build_bucket").write.mode(
            "overwrite"
        ).partitionBy("build_bucket").parquet(f"{workdir}/doc_urls")
        elapsed = time.monotonic() - t0
        # metrics per bucket from the committed files (docs, postings, bytes)
        from webindex.build import DOC_MARKER

        written = spark.read.parquet(f"{workdir}/runs").filter(
            F.col("build_bucket").isin(chunk)
        )
        stats = (
            written.groupBy("build_bucket")
            .agg(
                F.count(F.when(F.col("term") == DOC_MARKER, 1)).alias("docs"),
                F.count(F.when(F.col("term") != DOC_MARKER, 1)).alias("postings"),
            )
            .collect()
        )
        by_bucket = {int(r["build_bucket"]): r for r in stats}
        from webindex.fsutil import dir_bytes

        rows = []
        for b in chunk:
            r = by_bucket.get(b)
            # bytes = REAL committed size of this bucket's run files (FS
            # listing of the partition dir — the metric the lineage table
            # promises, not an estimate)
            nbytes = dir_bytes(spark, f"{workdir}/runs/build_bucket={b}")
            rows.append(
                (
                    b,
                    int(r["docs"]) if r else 0,
                    int(r["postings"]) if r else 0,
                    nbytes,
                    float(elapsed / len(chunk)),
                    "done",
                )
            )
        spark.createDataFrame(rows, schema=schema.LINEAGE).write.mode("append").parquet(
            f"{workdir}/lineage"
        )

    return spark.read.parquet(f"{workdir}/runs").drop("build_bucket")


def build_index_resumable(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    conf: BM25Config = DEFAULT,
    *,
    n_buckets: int = 16,
    chunk_buckets: int = 4,
    text_col: str = "html",
    doc_id_method: str = "hash",
    range_width: int | None = None,
    hash_primary_fn=None,
) -> Index:
    """Full build with checkpoint/resume on the scan stage, then the
    (term,bucket) shuffle into final index tables under <workdir>/index."""
    runs = build_runs_checkpointed(
        spark,
        pages,
        workdir,
        n_buckets=n_buckets,
        chunk_buckets=chunk_buckets,
        text_col=text_col,
        doc_id_method=doc_id_method,
    )

    from webindex.build import DOC_MARKER, vocab_and_corpus_agg

    doc_urls = spark.read.parquet(f"{workdir}/doc_urls")
    lens = runs.filter(F.col("term") == DOC_MARKER).select("doc_id", "doc_len")
    doc_stats = (
        doc_urls.select("doc_id", "url")
        .join(lens, "doc_id", "left")
        .select(
            "doc_id",
            "url",
            F.coalesce(F.col("doc_len"), F.lit(0)).cast("int").alias("doc_len"),
        )
    )
    # vocab + corpus stats in one pass over the checkpointed runs
    vocab_df, _vocab_handle, n_docs, avgdl = vocab_and_corpus_agg(runs)

    out = f"{workdir}/index"
    if range_width is None:
        from webindex.build import adaptive_range_width

        range_width = adaptive_range_width(n_docs)
    id_space = "hash" if doc_id_method == "hash" else "dense"
    # Pre-shuffle collision resolution, same as build_index: the vocabulary
    # aggregate above (one map-side-combined pass, vocab-sized) feeds both
    # collision resolution BEFORE the postings shuffle and the term_stats
    # table — a clash costs a remap, never a post-hoc abort after paying for
    # the whole build.
    from webindex.build import _with_idf, resolve_term_hashes, term_hash_expr

    _, hash_remap = resolve_term_hashes(vocab_df, primary_fn=hash_primary_fn)
    # round-6 tail: the same overlapped write chains as build.build_index
    # (guide §2.6) — (postings), (term_stats -> term_grams),
    # (doc_stats -> url_index), driver-side one-row sidecars; dictionary
    # tables coalesced to a data-derived file target; the redundant
    # assert_no_hash_collisions re-scan dropped (resolve_term_hashes above
    # already guarantees a collision-free dict or raises).
    from concurrent.futures import ThreadPoolExecutor

    from webindex.build import N_URL_BUCKETS, build_term_grams, url_index_projection
    from webindex.io import write_driver_table, write_table

    dict_files = max(1, n_docs // 2_000_000)

    def _write_postings() -> None:
        # hash-sorted-within-partition write (see build.build_index for why
        # not repartitionByRange): row-group pruning on term_hash IN (...)
        write_table(
            build_postings(
                runs, avgdl, conf, range_width, n_docs=n_docs, id_space=id_space,
                hash_remap=hash_remap, hash_primary_fn=hash_primary_fn,
            ),
            f"{out}/postings",
            sort_cols=["term_hash", "block_id"],
        )

    def _write_terms() -> None:
        write_table(
            _with_idf(
                vocab_df.withColumn(
                    "term_hash",
                    term_hash_expr(F.col("term"), hash_remap, hash_primary_fn),
                ),
                n_docs,
            ),
            f"{out}/term_stats",
            sort_cols=["term"],
            coalesce=dict_files,
        )
        # q-gram dictionary sidecar (same contract as build_index): derived
        # from the committed dictionary, gram-clustered for IN(gram) pruning
        write_table(
            build_term_grams(spark.read.parquet(f"{out}/term_stats")),
            f"{out}/term_grams",
            sort_cols=["gram"],
            coalesce=dict_files,
        )

    def _write_docs() -> None:
        write_table(
            doc_stats, f"{out}/doc_stats", sort_cols=["doc_id"],
            coalesce=dict_files,
        )
        # url reverse-lookup projection — the shared helper IS the contract.
        # repartition on the dir key: one url_hash-sorted file per bucket dir
        # instead of a tasks-x-buckets small-file fan-out (build.build_index)
        write_table(
            url_index_projection(doc_stats).repartition(
                N_URL_BUCKETS, F.col("url_bucket")
            ),
            f"{out}/url_index",
            sort_cols=["url_hash"],
            partition_by="url_bucket",
        )

    write_driver_table(
        spark, [(n_docs, avgdl, -1)], schema.CORPUS_STATS, f"{out}/corpus_stats"
    )
    # conf sidecar (same contract as build_index): load_index restores the
    # conf the blocks were encoded with
    write_driver_table(
        spark,
        [(conf.k1, conf.b, conf.block_size, conf.quantize_norms, range_width,
          id_space)],
        schema.INDEX_CONF,
        f"{out}/conf",
    )
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(_write_postings),
            pool.submit(_write_terms),
            pool.submit(_write_docs),
        ]
        for f in futs:
            f.result()
    _vocab_handle.unpersist()

    from webindex.build import hash_bucket_bits

    return Index(
        postings=spark.read.parquet(f"{out}/postings"),
        term_stats=spark.read.parquet(f"{out}/term_stats"),
        doc_stats=spark.read.parquet(f"{out}/doc_stats"),
        n_docs=n_docs,
        avgdl=avgdl,
        conf=conf,
        range_width=range_width,
        lineage=read_lineage(spark, workdir),
        url_stats=spark.read.parquet(f"{out}/url_index"),
        term_grams=spark.read.parquet(f"{out}/term_grams"),
        id_space=id_space,
        bucket_bits=(
            hash_bucket_bits(n_docs, range_width) if id_space == "hash" else None
        ),
    )
