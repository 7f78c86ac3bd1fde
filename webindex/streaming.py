"""Incremental / streaming index maintenance (Structured Streaming).

The reference is batch-with-incremental-windows: a watermark file records the
last harvest time (reference: src/nmr_FAIR_DOs/lib.py:436-437) and re-runs
only fetch the new window (cli.py:49-86); late-resolving entries are parked
and retried (lib.py:249-261, :343-371). The Spark-native generalization:

  pages stream (file source / Kafka at prod scale)
    -> withWatermark('warc_ts', delay)         late-data bound
    -> foreachBatch: SPIMI map (build_runs) -> APPEND to <workdir>/runs
    -> periodic COMPACTION: runs -> compressed posting blocks (merge-on-read
       flavor: queries can always rebuild from runs; compaction just refreshes
       the fast block tables)

Appending runs per micro-batch is cheap and idempotent-friendly (batch id
recorded in a lineage row); the heavyweight (term,bucket) shuffle runs only at
compaction. This mirrors Lucene's segment model: micro-batches are segments,
compaction is a segment merge — except our "segments" are run rows that Spark
merges with one shuffle, no n-way merge trees.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from webindex import schema
from webindex.bm25 import BM25Config, DEFAULT
from webindex.build import (
    DEFAULT_RANGE_WIDTH,
    Index,
    assign_doc_ids,
    build_postings,
    build_runs,
    build_term_stats,
)


class IncrementalIndexer:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        conf: BM25Config = DEFAULT,
        *,
        text_col: str = "html",
        watermark_delay: str = "1 hour",
        range_width: int | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.conf = conf
        self.text_col = text_col
        self.watermark_delay = watermark_delay
        self.range_width = range_width

    # -- ingestion ----------------------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: tokenize the micro-batch, append runs + urls.
        Re-delivered batches are detected via the lineage partition_id
        (= batch_id) and skipped (exactly-once on top of at-least-once)."""
        spark = batch_df.sparkSession
        try:
            seen = (
                spark.read.parquet(f"{self.workdir}/lineage")
                .filter(F.col("partition_id") == batch_id)
                .count()
            )
            if seen:
                return
        except Exception:
            pass
        t0 = time.monotonic()
        pages = assign_doc_ids(batch_df, "hash")
        runs = build_runs(pages, text_col=self.text_col)
        runs.write.mode("append").parquet(f"{self.workdir}/runs")
        pages.select("doc_id", "url").write.mode("append").parquet(
            f"{self.workdir}/doc_urls"
        )
        written = spark.read.parquet(f"{self.workdir}/runs")
        stats = pages.agg(F.count(F.lit(1)).alias("docs")).collect()[0]
        spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(stats["docs"]),
                    0,
                    0,
                    float(time.monotonic() - t0),
                    "done",
                )
            ],
            schema=schema.LINEAGE,
        ).write.mode("append").parquet(f"{self.workdir}/lineage")

    def start(self, source_dir: str, trigger_available_now: bool = True):
        """Stream pages parquet files from source_dir into the runs table."""
        stream = (
            self.spark.readStream.schema(schema.PAGES)
            .parquet(source_dir)
            .withWatermark("warc_ts", self.watermark_delay)
        )
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", f"{self.workdir}/_stream_ckpt")
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- compaction / query-side --------------------------------------------

    def compact(self) -> Index:
        """Merge all accumulated runs into fresh block tables (segment merge).
        Duplicate urls across batches keep the latest doc (dedup by doc_id —
        doc_id is url-derived so re-crawled pages collapse)."""
        from webindex.build import DOC_MARKER, corpus_stats_agg

        spark = self.spark
        runs = spark.read.parquet(f"{self.workdir}/runs").dropDuplicates(
            ["term", "doc_id"]
        )
        doc_urls = spark.read.parquet(f"{self.workdir}/doc_urls").dropDuplicates(
            ["doc_id"]
        )
        lens = runs.filter(F.col("term") == DOC_MARKER).select("doc_id", "doc_len")
        doc_stats = (
            doc_urls.join(lens, "doc_id", "left")
            .select(
                "doc_id",
                "url",
                F.coalesce(F.col("doc_len"), F.lit(0)).cast("int").alias("doc_len"),
            )
        )
        n_docs, avgdl = corpus_stats_agg(runs)

        out = f"{self.workdir}/index"
        range_width = self.range_width
        if range_width is None:
            from webindex.build import adaptive_range_width

            range_width = adaptive_range_width(n_docs)
        # (re-crawled urls already collapsed by the dedup at read above)
        build_postings(
            runs, avgdl, self.conf, range_width, n_docs=n_docs, id_space="hash"
        ).sortWithinPartitions("term", "block_id").write.mode("overwrite").parquet(
            f"{out}/postings"
        )
        from webindex.build import term_stats_from_postings

        term_stats_from_postings(
            spark.read.parquet(f"{out}/postings"), n_docs
        ).sortWithinPartitions("term").write.mode("overwrite").parquet(
            f"{out}/term_stats"
        )
        doc_stats.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
            f"{out}/doc_stats"
        )
        spark.createDataFrame(
            [(n_docs, avgdl, -1)], schema=schema.CORPUS_STATS
        ).write.mode("overwrite").parquet(f"{out}/corpus_stats")

        return Index(
            postings=spark.read.parquet(f"{out}/postings"),
            term_stats=spark.read.parquet(f"{out}/term_stats"),
            doc_stats=spark.read.parquet(f"{out}/doc_stats"),
            n_docs=n_docs,
            avgdl=avgdl,
            conf=self.conf,
            range_width=range_width,
        )
