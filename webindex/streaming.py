"""Incremental / streaming index maintenance (Structured Streaming).

The reference is batch-with-incremental-windows: a watermark file records the
last harvest time (reference: src/nmr_FAIR_DOs/lib.py:436-437) and re-runs
only fetch the new window (cli.py:49-86); late-resolving entries are parked
and retried (lib.py:249-261, :343-371). The Spark-native generalization:

  pages stream (file source / Kafka at prod scale)
    -> withWatermark('warc_ts', delay)         late-data bound
    -> foreachBatch: SPIMI map (build_runs) -> runs partitioned by batch_id
    -> periodic COMPACTION into compressed posting blocks.

Compaction is TIERED (Lucene-style segment merge, reference:
src/nmr_FAIR_DOs/connectors/elasticsearch.py:204-232 gets this for free from
ES bulk calls — each bulk pays only for its batch):

  * the first compact shuffles everything once and writes posting blocks
    PARTITIONED BY bucket (the doc-range shard);
  * every later compact reads ONLY the delta batches' runs (partition-pruned
    by batch_id), finds the touched buckets, decodes ONLY those buckets' old
    blocks back to runs, drops rows of re-crawled docs, merges with the delta
    and re-encodes — a dynamic-partition overwrite of the touched bucket
    directories. Untouched buckets are never read, shuffled, or rewritten.
  * re-crawled urls follow LATEST-CRAWL-WINS: doc_id is url-derived, each
    runs row carries its batch_id, and a doc's rows from any older batch are
    dropped at merge (old postings via the touched-bucket decode, newer
    in-delta duplicates via an argmax-per-doc join) — no hybrid documents
    mixing stale and fresh terms.
  * avgdl drifts as the corpus grows; untouched blocks keep the avgdl they
    were encoded with (avgdl0 column) and the query path scales their
    max_impact bound by max(1, avgdl/avgdl0), which keeps block-max WAND
    exact without rewriting them.

Single-doc upsert (reference: elasticsearch.py:175-202 client.index upsert
semantics) is a one-row micro-batch through the same path: `upsert(pages)`
appends a synthetic batch and compacts — cost is O(that doc's buckets), not
O(corpus).

The bucket-bit count is pinned in compaction state so the shard layout stays
stable as n_docs grows (growing past ~4x the original corpus should trigger
an explicit full re-shard compact: `compact(full=True)`).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from webindex import schema
from webindex.bm25 import BM25Config, DEFAULT
from webindex.build import (
    DOC_MARKER,
    Index,
    adaptive_range_width,
    assign_doc_ids,
    bucket_expr,
    build_postings,
    build_runs,
    decode_postings_to_runs,
    hash_bucket_bits,
    term_stats_from_postings,
)


from webindex.fsutil import hadoop_fs as _hadoop_fs, hadoop_delete as _hadoop_delete


def _swap_partition_dirs(
    spark: SparkSession, staging: str, final: str, stale_buckets: set[int]
) -> set[int]:
    """Commit a staged partitioned write: atomically (per-dir rename) replace
    each bucket=N directory present in staging, and drop stale bucket dirs
    that produced no output. Returns the set of staged bucket ids. This is
    the plain-FS stand-in for an Iceberg RewriteFiles/overwrite-partitions
    commit — swap is metadata-only, never a data copy."""
    fs, jvm = _hadoop_fs(spark, staging)
    Path = jvm.org.apache.hadoop.fs.Path
    staged = []
    for st in fs.listStatus(Path(staging)):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("bucket="):
            staged.append(name)
    staged_ids = {int(n.split("=", 1)[1]) for n in staged}
    fs.mkdirs(Path(final))
    for name in staged:
        dst = Path(f"{final}/{name}")
        if fs.exists(dst):
            fs.delete(dst, True)
        _rename_checked(fs, Path(f"{staging}/{name}"), dst)
    for b in stale_buckets - staged_ids:
        dst = Path(f"{final}/bucket={b}")
        if fs.exists(dst):
            fs.delete(dst, True)
    fs.delete(Path(staging), True)
    return staged_ids


def _rename_checked(fs, src, dst) -> None:
    """Hadoop FileSystem.rename signals some failures by RETURNING false
    (object stores, dst races) instead of throwing — an unchecked false
    followed by a staging delete would destroy the only copy of freshly
    built blocks. Never ignore it."""
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst} (filesystem returned false)")


class IncrementalIndexer:
    """The BM25Config is persisted in the compaction state table (k1/b feed
    max_impact; quantize_norms changes the doc_lens byte format): resuming an
    existing workdir restores the conf the blocks were encoded with,
    overriding the constructor argument — same guarantee as build_index's
    conf sidecar.

    A workdir is SINGLE-WRITER: batch ids (the latest-event-wins total
    order) are allocated by read-then-write against the lineage table, so
    exactly one process may ingest/upsert/delete/compact a workdir at a
    time. Within one process the indexer enforces the reachable half of
    the contract (_require_no_active_stream: synthetic events are refused
    while a stream this indexer started is active); concurrent writers in
    other processes must be excluded by the caller's orchestration."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        conf: BM25Config = DEFAULT,
        *,
        text_col: str = "html",
        watermark_delay: str = "1 hour",
        range_width: int | None = None,
        hash_primary_fn=None,
        positions: bool = False,
    ):
        self.spark = spark
        self.workdir = workdir
        self.conf = conf
        self.text_col = text_col
        self.watermark_delay = watermark_delay
        self.range_width = range_width
        # positional runs/blocks (phrase queries). Positions ride compaction
        # as opaque per-doc byte spans: the touched-bucket decode splits them
        # at byte boundaries (codec.positions_byte_slices), never re-encodes.
        self.positions = positions
        # injectable primary term hash (tests force collisions with a coarse
        # space; production always uses xxhash64 — see build.term_hash_col)
        self.hash_primary_fn = hash_primary_fn
        # the stream this indexer started, if any — synthetic events
        # (upsert/delete) are fenced against it (_require_no_active_stream)
        self._active_query = None
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- ingestion ----------------------------------------------------------

    @classmethod
    def open(cls, spark: SparkSession, workdir: str, **kw) -> "IncrementalIndexer":
        """Attach to an EXISTING workdir, adopting its committed positional
        layout instead of the constructor default — the committed runs
        schema is the ground truth, so callers that only operate on an
        existing index (CLI delete / delete-by-query / compact) never need
        to know how it was built. Falls back to the constructor default
        when no runs are committed yet (fresh workdir)."""
        if "positions" not in kw:
            try:
                cols = spark.read.parquet(f"{workdir}/runs").columns
                kw["positions"] = "positions" in cols
            except Exception:
                pass  # fresh workdir: constructor default stands
        return cls(spark, workdir, **kw)

    def _check_positions_layout(self) -> None:
        """Fail loudly if the constructor's positions flag disagrees with the
        committed runs layout. The committed runs schema is the ground truth
        (a schema-only probe — no data read): writing mixed-schema runs
        partitions would make a later full compact either crash on null
        position buffers or build blocks whose positional-ness depends on
        which part-file Spark samples the schema from."""
        try:
            cols = self.spark.read.parquet(f"{self.workdir}/runs").columns
        except Exception:
            return  # no committed runs yet: the constructor's flag stands
        committed = "positions" in cols
        if committed != self.positions:
            raise ValueError(
                f"positions={self.positions} but the committed runs at "
                f"{self.workdir}/runs are "
                f"{'positional' if committed else 'non-positional'}; "
                f"construct IncrementalIndexer with positions={committed} "
                "(or use a fresh workdir to change the layout)"
            )

    def _checkpoint_query_id(self) -> str | None:
        """The streaming query id persisted in the engine checkpoint's
        metadata file. This is the CHECKPOINT'S identity: it survives
        restarts from the same checkpoint but changes whenever the
        checkpoint is reset or relocated — exactly the event after which
        engine epochs recycle from 0 and must NOT match old _epoch_map
        rows (keying redelivery detection on the bare epoch number would
        silently skip the new stream's first batches as 'redeliveries').
        None when no checkpoint metadata exists yet."""
        import json

        from webindex.fsutil import path_exists

        p = f"{self.workdir}/_stream_ckpt/metadata"
        if not path_exists(self.spark, p):
            return None
        txt = "".join(
            r["value"] for r in self.spark.read.text(p).collect()
        )
        return str(json.loads(txt)["id"])

    def _seen_epochs(self, qid: str | None) -> set[int]:
        """Engine epochs already ingested FOR THIS CHECKPOINT IDENTITY (the
        _epoch_map sidecar, keyed (qid, epoch)). Rows written by the
        pre-round-5 layout carry no qid column and are counted for any qid
        (same behavior as before; a legacy workdir whose checkpoint was
        ALSO reset keeps the old flaw — rebuild the workdir to clear it).
        Only a MISSING sidecar means none — any other read failure
        propagates (silently treating it as empty would re-ingest, or
        worse, collide)."""
        from webindex.fsutil import path_exists

        p = f"{self.workdir}/_epoch_map"
        if not path_exists(self.spark, p):
            return set()
        df = self.spark.read.option("mergeSchema", "true").parquet(p)
        if "qid" in df.columns:
            df = df.filter(F.col("qid").isNull() | (F.col("qid") == qid))
        return {int(r["epoch"]) for r in df.select("epoch").collect()}

    def _next_batch_id(self) -> int:
        done = self._done_batches()
        return (max(done) + 1) if done else 0

    def _require_no_active_stream(self, action: str) -> None:
        """Batch ids are allocated by an unfenced read-then-write
        (_next_batch_id); the workdir is SINGLE-WRITER by contract. This
        guard enforces the one violation this object can see: a synthetic
        event (upsert/delete) racing a stream this indexer started could
        claim the same batch id as an in-flight micro-batch, breaking the
        latest-event-wins total order (a tombstone and a crawl sharing an
        id makes the winner undefined). Cross-process writers are outside
        any one JVM's view — coordinate those externally."""
        q = self._active_query
        if q is not None and q.isActive:
            raise RuntimeError(
                f"{action} while the stream started by this indexer is "
                "active would race its batch-id allocation; stop the "
                "stream (query.stop() / awaitTermination) first"
            )

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch sink. The engine's epoch counter and this index's
        batch order are DECOUPLED: synthetic batches (upsert/delete) also
        consume batch ids, and the streaming checkpoint knows nothing about
        them — reusing the epoch as the batch id would make a restarted
        stream's next epoch collide with a synthetic batch and be silently
        skipped as a 'redelivery', losing its pages forever. So every ingest
        allocates the next internal id (total event order preserved: later
        wall-clock events get higher ids) and redelivered engine epochs are
        detected via the _epoch_map sidecar (epoch -> internal id), written
        AFTER the lineage commit — a crash between the two re-ingests the
        same pages under a fresh id, which latest-crawl-wins collapses."""
        qid = self._checkpoint_query_id()
        if int(epoch_id) in self._seen_epochs(qid):
            return
        our_id = self._next_batch_id()
        self._ingest_pages(batch_df, our_id)
        from webindex.io import append_driver_rows

        append_driver_rows(
            self.spark,
            [(qid, int(epoch_id), int(our_id))],
            "qid string, epoch long, batch_id long",
            f"{self.workdir}/_epoch_map",
            fmt="parquet",
        )

    def _ingest_pages(self, batch_df: DataFrame, batch_id: int) -> None:
        """Tokenize one batch of pages and commit runs + urls + lineage
        under the given internal batch id."""
        spark = batch_df.sparkSession
        self._check_positions_layout()
        t0 = time.monotonic()
        # latest-wins WITHIN the micro-batch: one source batch can contain
        # the same url several times (several crawl files per trigger);
        # keep the newest warc_ts (content-hash tiebreak for determinism)
        w = Window.partitionBy("url").orderBy(
            F.desc_nulls_last("warc_ts"), F.asc(F.xxhash64("html"))
        )
        deduped = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if "doc_id" in deduped.columns:
            # identity in the incremental path is xxhash64(url) — a caller-
            # supplied doc_id would make tombstones miss and latest-wins
            # unable to collapse recrawls (assign_doc_ids passes a
            # pre-existing column through)
            deduped = deduped.drop("doc_id")
        pages = assign_doc_ids(deduped, "hash")
        runs = build_runs(
            pages, text_col=self.text_col, with_positions=self.positions
        ).withColumn("batch_id", F.lit(int(batch_id)))
        runs.write.mode("overwrite").partitionBy("batch_id").parquet(
            f"{self.workdir}/runs"
        )
        pages.select("doc_id", "url").withColumn(
            "batch_id", F.lit(int(batch_id))
        ).write.mode("overwrite").partitionBy("batch_id").parquet(
            f"{self.workdir}/doc_urls"
        )
        # metrics from the COMMITTED runs partition (one pruned columnar job:
        # docs = DOC_MARKER rows, postings = the rest) + real committed bytes
        # of both partition dirs (FS listing, no data read) — same contract as
        # the batch path's lineage (checkpoint.py).
        from webindex.fsutil import dir_bytes

        m = (
            spark.read.parquet(f"{self.workdir}/runs")
            .filter(F.col("batch_id") == batch_id)
            .agg(
                F.count(F.when(F.col("term") == DOC_MARKER, 1)).alias("docs"),
                F.count(F.when(F.col("term") != DOC_MARKER, 1)).alias("postings"),
            )
            .collect()[0]
        )
        nbytes = dir_bytes(
            spark, f"{self.workdir}/runs/batch_id={batch_id}"
        ) + dir_bytes(spark, f"{self.workdir}/doc_urls/batch_id={batch_id}")
        from webindex.io import append_driver_rows

        append_driver_rows(
            spark,
            [
                (
                    int(batch_id),
                    int(m["docs"]),
                    int(m["postings"]),
                    int(nbytes),
                    float(time.monotonic() - t0),
                    "done",
                )
            ],
            schema.LINEAGE,
            f"{self.workdir}/lineage",
            fmt="parquet",
        )

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
        q = writer.start()
        self._active_query = q
        return q

    def upsert(self, pages: DataFrame, compact_now: bool = True) -> "Index | None":
        """Single-record/doc upsert (S8): route one small pages DataFrame
        through the batch sink as a synthetic batch (id = max seen + 1, so
        latest-crawl-wins ordering holds) and optionally compact immediately.
        Compaction cost is O(the touched buckets), not O(corpus)."""
        self._require_no_active_stream("upsert")
        self._ingest_pages(pages, self._next_batch_id())
        return self.compact() if compact_now else None

    def delete(self, urls, compact_now: bool = True) -> "Index | None":
        """ES DELETE /<index>/_doc/<id> analogue: tombstone documents by url.

        A delete is an EVENT in the same total batch order as crawls: the
        tombstone batch gets the next batch id and is recorded in lineage, so
        per doc the latest event wins — delete-then-recrawl resurrects the
        doc, crawl-then-delete removes it (ES versioned-delete semantics).
        Tombstones are applied PHYSICALLY at the next compact (the segment
        merge, exactly where Lucene reclaims deleted docs): the dead docs'
        posting rows are dropped from their touched buckets only, doc_stats
        rows removed, and n_docs / avgdl / df all shrink accordingly —
        deleted docs stop influencing every score. Like upsert, visibility
        is at compact() (the refresh point of this engine).

        `urls` is a list[str] or a DataFrame with a url column. Deleting a
        url that was never crawled is a recorded no-op (ES returns
        result=not_found)."""
        self._require_no_active_stream("delete")
        spark = self.spark
        if isinstance(urls, DataFrame):
            u = urls.select("url").distinct()
        else:
            u = spark.createDataFrame(
                [(x,) for x in urls], "url string"
            ).distinct()
        batch_id = self._next_batch_id()
        t0 = time.monotonic()
        # doc_id derivation MUST match the ingest side (assign_doc_ids
        # "hash"): the tombstone kills exactly the doc the url maps to
        u.select(
            F.xxhash64(F.col("url")).alias("doc_id"),
            "url",
            F.lit(int(batch_id)).alias("batch_id"),
        ).write.mode("overwrite").partitionBy("batch_id").parquet(
            f"{self.workdir}/deletes"
        )
        from webindex.fsutil import dir_bytes

        nbytes = dir_bytes(spark, f"{self.workdir}/deletes/batch_id={batch_id}")
        from webindex.io import append_driver_rows

        append_driver_rows(
            spark,
            [(int(batch_id), 0, 0, int(nbytes), float(time.monotonic() - t0), "done")],
            schema.LINEAGE,
            f"{self.workdir}/lineage",
            fmt="parquet",
        )
        if compact_now and not self._has_runs():
            # tombstones on a never-ingested workdir: the recorded no-op the
            # docstring promises — the tombstone batch is committed (a later
            # crawl still outranks it by batch order) but there is no corpus
            # to compact yet
            return None
        return self.compact() if compact_now else None

    def delete_by_query(
        self, query: str, msm: int = 1, compact_now: bool = True
    ) -> "Index | None":
        """ES _delete_by_query: tombstone every doc matching `query` (>= msm
        distinct terms — filter-context match, no scoring). Like ES, the
        match set is a SNAPSHOT of the current index: the constant-score
        block scan resolves matching doc_ids, their urls come from the
        doc_id-keyed doc_stats join, and the whole set becomes one tombstone
        batch through delete()."""
        from webindex.aggs import matching_doc_ids

        if not self._has_runs():
            # never-ingested workdir: the snapshot match set is necessarily
            # empty — ES _delete_by_query deletes nothing on an empty index
            return None
        idx = self.compact()
        ids = matching_doc_ids(idx, query, msm)
        urls = idx.doc_stats.join(ids, "doc_id", "semi").select("url")
        return self.delete(urls, compact_now)

    def _has_runs(self) -> bool:
        """True once at least one page batch committed a runs partition —
        the precondition for compact() (tombstone-only workdirs have
        lineage but no corpus)."""
        from webindex.fsutil import path_exists

        return path_exists(self.spark, f"{self.workdir}/runs")

    def _new_tombstones(self, min_batch: int | None = None) -> DataFrame | None:
        """(doc_id, batch_id) tombstone events, optionally only those after
        min_batch (the compaction frontier). None ONLY when no deletes table
        exists (the zero-cost common case) — any other read failure
        propagates: silently treating a corrupt/unreadable deletes table as
        'no deletes' would resurrect deleted docs at the next compact."""
        from webindex.fsutil import path_exists

        if not path_exists(self.spark, f"{self.workdir}/deletes"):
            return None
        d = self.spark.read.parquet(f"{self.workdir}/deletes")
        if min_batch is not None:
            d = d.filter(F.col("batch_id") > min_batch)
        return d.select("doc_id", "batch_id")

    # -- compaction / query-side --------------------------------------------

    def _done_batches(self) -> list[int]:
        """Committed batch ids, in order. Only a MISSING lineage table means
        none — any other read failure propagates: treating a transiently
        unreadable lineage as empty would hand out batch id 0 again and
        dynamically OVERWRITE the committed batch-0 runs partition."""
        from webindex.fsutil import path_exists

        if not path_exists(self.spark, f"{self.workdir}/lineage"):
            return []
        rows = (
            self.spark.read.parquet(f"{self.workdir}/lineage")
            .filter(F.col("status") == "done")
            .select("partition_id")
            .distinct()
            .collect()
        )
        return sorted(int(r["partition_id"]) for r in rows)

    def _read_state(self):
        """Read compaction state; if it persists a BM25Config (round-3+
        layout), RESTORE it over the constructor's conf — the committed
        blocks' byte format and max_impact bounds are functions of the conf
        they were encoded with, so resuming with anything else would silently
        mis-score (the streaming analogue of build_index's conf sidecar)."""
        try:
            row = self.spark.read.parquet(f"{self.workdir}/index/_state").collect()[0]
        except Exception:
            return None
        d = row.asDict()
        # round-3+ layout persists the conf: restore it (pre-conf state rows
        # lack "k1" and fall through to the constructor's conf)
        if "k1" in d:
            self.conf = BM25Config(
                k1=float(d["k1"]),
                b=float(d["b"]),
                block_size=int(d["block_size"]),
                quantize_norms=bool(d["quantize_norms"]),
            )
            self.positions = bool(d["positions"])
        return row

    def _write_state(
        self, max_batch: int, bits: int, range_width: int, n_docs: int, sum_dl: float
    ) -> None:
        # one-row sidecar: driver-side pyarrow write (no Spark job) with the
        # arrow schema derived from the same StructType — bit-identical
        # round-trip, ~0.5-1s of fixed job latency saved per compact
        # (round 6, same as build_index's corpus_stats/conf sidecars)
        from webindex.io import write_driver_table

        c = self.conf
        write_driver_table(
            self.spark,
            [
                (
                    int(max_batch),
                    int(bits),
                    int(range_width),
                    int(n_docs),
                    float(sum_dl),
                    float(c.k1),
                    float(c.b),
                    int(c.block_size),
                    bool(c.quantize_norms),
                    bool(self.positions),
                )
            ],
            schema.COMPACT_STATE,
            f"{self.workdir}/index/_state",
            fmt="parquet",
        )

    def _latest_wins(self, runs: DataFrame, doc_urls: DataFrame) -> DataFrame:
        """Keep only each doc's rows from its newest batch (re-crawl collapse
        WITHIN the considered batch set). The per-doc max batch comes from the
        thin doc_urls table, then an equi-join filters runs — no window sort
        over the full runs volume."""
        latest = doc_urls.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
        return runs.join(latest, ["doc_id", "batch_id"]).drop("batch_id")

    def _doc_stats_of(self, runs_latest: DataFrame, doc_urls_latest: DataFrame) -> DataFrame:
        lens = runs_latest.filter(F.col("term") == DOC_MARKER).select("doc_id", "doc_len")
        return doc_urls_latest.join(lens, "doc_id", "left").select(
            "doc_id",
            "url",
            F.coalesce(F.col("doc_len"), F.lit(0)).cast("int").alias("doc_len"),
        )

    def _write_postings(self, postings: DataFrame) -> None:
        (
            postings.sortWithinPartitions("bucket", "term_hash", "block_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{self.workdir}/index/postings")
        )

    def _load_index(
        self, n_docs: int, avgdl: float, range_width: int,
        bucket_bits: int | None = None,
    ) -> Index:
        spark, out = self.spark, f"{self.workdir}/index"
        return Index(
            postings=spark.read.parquet(f"{out}/postings"),
            term_stats=spark.read.parquet(f"{out}/term_stats"),
            doc_stats=spark.read.parquet(f"{out}/doc_stats"),
            n_docs=n_docs,
            avgdl=avgdl,
            conf=self.conf,
            range_width=range_width,
            # incremental identity is always xxhash64(url); bits are PINNED
            # in compaction state (recomputing from grown n_docs would remap
            # buckets the committed blocks don't use)
            id_space="hash",
            bucket_bits=bucket_bits,
        )

    def _finish_tables(self, n_docs: int, term_dict: DataFrame) -> None:
        # staged write + FS rename: the incremental path's term_dict LAZILY
        # reads the current term_stats table, so overwriting it in the same
        # job would read-and-clobber the input. Commit order keeps a
        # recoverable table at every step (a crash mid-commit leaves either
        # the old table, both, or the new one — never neither): rename the
        # old table ASIDE, rename staging in, then drop the old copy.
        spark, out = self.spark, f"{self.workdir}/index"
        staging = f"{out}/_term_stats_staging"
        # data-derived file target (round 6, same as the batch/full-compact
        # dictionaries): without it every incremental compact re-fragments
        # the dictionary into shuffle-partition-many overlapping-range files
        # and live queries pay per-file open cost on every stats probe
        dict_files = max(1, n_docs // 2_000_000)
        term_stats_from_postings(
            spark.read.parquet(f"{out}/postings"), n_docs, term_dict
        ).coalesce(dict_files).sortWithinPartitions("term").write.mode(
            "overwrite"
        ).parquet(staging)
        fs, jvm = _hadoop_fs(spark, out)
        Path = jvm.org.apache.hadoop.fs.Path
        final = Path(f"{out}/term_stats")
        old = Path(f"{out}/_term_stats_old")
        if fs.exists(old):
            # leftover from a crashed commit. If the crash hit between
            # rename(final→old) and rename(staging→final), the old copy is
            # the ONLY surviving table — restore it (it becomes `old` again
            # two lines down); otherwise it's a superseded duplicate: drop it.
            if not fs.exists(final):
                _rename_checked(fs, old, final)
            else:
                fs.delete(old, True)
        if fs.exists(final):
            _rename_checked(fs, final, old)
        _rename_checked(fs, Path(staging), final)
        if fs.exists(old):
            fs.delete(old, True)

    def _recover_term_stats(self) -> None:
        """Make the crashed-commit recovery in _finish_tables REACHABLE: a
        crash between rename(term_stats→old) and rename(staging→term_stats)
        leaves only _term_stats_old, and every incremental compact reads
        term_stats long before _finish_tables runs — so the restore must
        happen at compact entry, not inside the next commit."""
        from webindex.fsutil import path_exists

        out = f"{self.workdir}/index"
        old_p, final_p = f"{out}/_term_stats_old", f"{out}/term_stats"
        if path_exists(self.spark, old_p) and not path_exists(self.spark, final_p):
            fs, jvm = _hadoop_fs(self.spark, out)
            Path = jvm.org.apache.hadoop.fs.Path
            _rename_checked(fs, Path(old_p), Path(final_p))

    def live_index(self) -> Index:
        """The committed index with PENDING deletes applied logically — ES
        refresh-interval delete semantics between compacts (reference:
        src/nmr_FAIR_DOs/connectors/elasticsearch.py delete-then-search sees
        the delete at the next refresh, long before any segment merge).

        Tombstone events newer than the compaction frontier become
        Index.dead_ids, the analogue of Lucene's in-heap deleted-docs
        bitmap: the fused BM25 scorer (topk/topk_wand/topk_exact/bool/
        match/function_score) drops dead docs BEFORE its local top-k cut
        and θ seeding ignores them, while n_docs/avgdl/df stay as-built —
        exactly Lucene's behavior until the merge reclaims the docs. The
        set is driver-scale by construction (deletes since the last
        compact only). Pending CRAWL batches stay invisible until
        compact(), the engine's refresh point for additions; query
        families that bypass the fused scorer (phrase, aggs, term-level)
        likewise see deletes at compact().

        Requires a committed index (compact() at least once); raises
        otherwise."""
        state = self._read_state()
        if state is None:
            raise RuntimeError(
                "no committed index yet: run compact() before live_index()"
            )
        idx = self._load_index(
            int(state["n_docs"]),
            float(state["sum_dl"]) / max(1, int(state["n_docs"])),
            int(state["range_width"]),
            int(state["bucket_bits"]),
        )
        tombs = self._new_tombstones(min_batch=int(state["max_batch"]))
        if tombs is None:
            return idx
        import numpy as np

        dead = np.array(
            sorted(
                int(r["doc_id"])
                for r in tombs.select("doc_id").distinct().collect()
            ),
            dtype=np.int64,
        )
        if len(dead):
            idx.dead_ids = dead
        return idx

    def compact(self, full: bool = False) -> Index:
        """Merge accumulated runs into the block tables. First call (or
        full=True, e.g. to re-shard after heavy growth) compacts everything;
        later calls merge only the delta batches into their touched buckets.
        Returns the refreshed Index. Metrics for the merge (delta rows,
        decoded old rows, touched buckets) are appended to
        <workdir>/compactions."""
        from webindex.fsutil import path_exists

        # the layout check runs for FULL compacts too: full=True skips the
        # state-driven incremental branch but must still not re-encode a
        # committed positional layout as non-positional (or vice versa)
        self._check_positions_layout()
        self._recover_term_stats()
        # _read_state runs for FULL compacts too: full=True only skips the
        # incremental branch — the persisted conf must still be restored so
        # a full re-shard never silently re-encodes with the constructor's
        # (default) k1/b/quantize_norms
        state = self._read_state()
        if full:
            state = None
        pending = f"{self.workdir}/_compact_pending"
        if state is not None and path_exists(self.spark, pending):
            # a previous incremental compact crashed between its table swaps
            # and its state write: the committed tables and the state counts
            # disagree, and re-running the delta against the already-swapped
            # doc_stats would double-count removals. The runs history is the
            # ground truth — rebuild from it.
            raise RuntimeError(
                "interrupted incremental compaction detected "
                f"({pending} exists): run compact(full=True) to rebuild "
                "tables and stats from the runs history"
            )
        done = self._done_batches()
        if state is not None and int(state["max_batch"]) >= (max(done) if done else -1):
            return self._load_index(
                int(state["n_docs"]),
                float(state["sum_dl"]) / max(1, int(state["n_docs"])),
                int(state["range_width"]),
                int(state["bucket_bits"]),
            )
        if state is None:
            return self._compact_full(done)
        return self._compact_incremental(state, done)

    def _compact_full(self, done: list[int]) -> Index:
        spark = self.spark
        if not self._has_runs():
            raise ValueError(
                "compact() on a workdir with no ingested pages — ingest at "
                "least one batch first (tombstone-only workdirs have no "
                "corpus to compact)"
            )
        runs = spark.read.parquet(f"{self.workdir}/runs")
        doc_urls = spark.read.parquet(f"{self.workdir}/doc_urls")
        runs_latest = self._latest_wins(runs, doc_urls)
        doc_urls_latest = doc_urls.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("batch_id"))
            ),
        ).filter(F.col("rn") == 1).select("doc_id", "url")
        # tombstones: per doc the LATEST event wins across the full history —
        # a doc whose newest delete outranks its newest crawl is dead and
        # contributes nothing to postings, doc_stats, n_docs, or avgdl
        tombs = self._new_tombstones()
        if tombs is not None:
            crawl_latest = doc_urls.groupBy("doc_id").agg(
                F.max("batch_id").alias("cb")
            )
            dead = (
                tombs.groupBy("doc_id")
                .agg(F.max("batch_id").alias("db"))
                .join(crawl_latest, "doc_id", "left")
                .filter(F.col("cb").isNull() | (F.col("db") > F.col("cb")))
                .select("doc_id")
            )
            runs_latest = runs_latest.join(dead, "doc_id", "left_anti")
            doc_urls_latest = doc_urls_latest.join(dead, "doc_id", "left_anti")
        doc_stats = self._doc_stats_of(runs_latest, doc_urls_latest)
        from webindex.build import vocab_and_corpus_agg

        # vocab + corpus stats in ONE pass over the merged runs (the
        # DOC_MARKER group carries n_docs and the token total)
        vocab_df, vocab_handle, n_docs, avgdl = vocab_and_corpus_agg(runs_latest)

        range_width = self.range_width or adaptive_range_width(n_docs)
        bits = hash_bucket_bits(n_docs, range_width)
        out = f"{self.workdir}/index"
        # full re-shard may change the bucket layout: clear old dirs so no
        # stale partitions survive the dynamic overwrite
        _hadoop_delete(spark, f"{out}/postings")
        _hadoop_delete(spark, f"{out}/doc_stats")
        # full compact mirrors the batch build: df + dictionary + corpus
        # stats in ONE map-side-combined pass (vocab_and_corpus_agg above),
        # with pre-shuffle hash-collision resolution (a fresh full compact
        # may re-key; only the incremental path must preserve committed keys)
        from webindex.build import _with_idf, resolve_term_hashes, term_hash_expr

        _, remap = resolve_term_hashes(vocab_df, primary_fn=self.hash_primary_fn)
        # round-6 tail, same as build.build_index / checkpoint (guide §2.6):
        # the three table writes are independent chains — overlap them so a
        # chain's task tail back-fills the others. The dictionary coalesces
        # to a data-derived file target (guide §6 small-files: live_index's
        # per-query dictionary probe pays per-file open cost); the post-write
        # assert_no_hash_collisions re-scan is dropped because
        # resolve_term_hashes above already raised on any unresolved clash
        # BEFORE the shuffle (same proof as build_index, round 6).
        from concurrent.futures import ThreadPoolExecutor

        from webindex.io import write_driver_table

        dict_files = max(1, n_docs // 2_000_000)

        def _w_postings() -> None:
            self._write_postings(
                build_postings(
                    runs_latest,
                    avgdl,
                    self.conf,
                    range_width,
                    n_docs=n_docs,
                    id_space="hash",
                    bucket_bits=bits,
                    hash_remap=remap,
                    hash_primary_fn=self.hash_primary_fn,
                )
            )

        def _w_terms() -> None:
            _with_idf(
                vocab_df.withColumn(
                    "term_hash",
                    term_hash_expr(F.col("term"), remap, self.hash_primary_fn),
                ),
                n_docs,
            ).coalesce(dict_files).sortWithinPartitions("term").write.mode(
                "overwrite"
            ).parquet(f"{out}/term_stats")

        def _w_docs() -> None:
            doc_stats.withColumn(
                "bucket",
                bucket_expr(F.col("doc_id"), n_docs, range_width, "hash", bits),
            ).sortWithinPartitions("doc_id").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(f"{out}/doc_stats")

        write_driver_table(
            spark, [(n_docs, avgdl, -1)], schema.CORPUS_STATS,
            f"{out}/corpus_stats", fmt="parquet",
        )
        with ThreadPoolExecutor(max_workers=3) as pool:
            for fut in [
                pool.submit(_w_postings),
                pool.submit(_w_terms),
                pool.submit(_w_docs),
            ]:
                fut.result()
        vocab_handle.unpersist()
        self._write_state(max(done) if done else -1, bits, range_width, n_docs, n_docs * avgdl)
        # a full compact rebuilds every table and stat from the runs history,
        # so it clears any interrupted-incremental fence (the recovery route
        # compact() directs to)
        _hadoop_delete(self.spark, f"{self.workdir}/_compact_pending")
        self._log_compaction(done, "full", delta_rows=-1, old_rows=-1, touched=-1)
        return self._load_index(n_docs, avgdl, range_width, bits)

    def _compact_incremental(self, state, done: list[int]) -> Index:
        spark = self.spark
        out = f"{self.workdir}/index"
        bits = int(state["bucket_bits"])
        range_width = int(state["range_width"])
        old_n, old_sum = int(state["n_docs"]), float(state["sum_dl"])
        delta_batches = [b for b in done if b > int(state["max_batch"])]

        runs = spark.read.parquet(f"{self.workdir}/runs").filter(
            F.col("batch_id").isin(delta_batches)
        )
        doc_urls = spark.read.parquet(f"{self.workdir}/doc_urls").filter(
            F.col("batch_id").isin(delta_batches)
        )
        # tombstone events newer than the compaction frontier: a delete
        # outranked by a same-delta recrawl is void (latest event wins); a
        # delete of a never-seen doc is a no-op that still advances state
        old_doc_stats = spark.read.parquet(f"{out}/doc_stats")
        dead_ids = None
        tombs = self._new_tombstones(min_batch=int(state["max_batch"]))
        if tombs is not None:
            crawl_latest = doc_urls.groupBy("doc_id").agg(
                F.max("batch_id").alias("cb")
            )
            dead_ids = (
                tombs.groupBy("doc_id")
                .agg(F.max("batch_id").alias("db"))
                .join(crawl_latest, "doc_id", "left")
                .filter(F.col("cb").isNull() | (F.col("db") > F.col("cb")))
                .select("doc_id")
                .persist()
            )
            if dead_ids.count() == 0:
                dead_ids.unpersist()
                dead_ids = None

        # latest-wins WITHIN the delta; rows from batches already compacted
        # are handled below by dropping re-crawled docs from the old blocks
        delta_runs = self._latest_wins(runs, doc_urls)
        if dead_ids is not None:
            delta_runs = delta_runs.join(dead_ids, "doc_id", "left_anti")
        delta_runs = delta_runs.persist()
        delta_docs = delta_runs.filter(F.col("term") == DOC_MARKER).select(
            "doc_id", "doc_len"
        ).persist()
        bcol = bucket_expr(F.col("doc_id"), old_n, range_width, "hash", bits)
        bucket_src = delta_docs.select(bcol.alias("bucket"))
        if dead_ids is not None:
            # dead docs' committed rows live in their own buckets: those
            # must decode+rewrite too (doc_stats is bucket-partitioned, so
            # this is a thin semi-join, not an id->bucket recompute)
            bucket_src = bucket_src.unionByName(
                old_doc_stats.join(dead_ids, "doc_id", "semi").select("bucket")
            )
        buckets = [
            int(r["bucket"]) for r in bucket_src.distinct().collect()
        ]
        n_delta = delta_docs.count()
        if n_delta == 0 and dead_ids is None:
            delta_runs.unpersist(); delta_docs.unpersist()
            return self._load_index(old_n, old_sum / max(1, old_n), range_width, bits)

        # ---- old state for the removed docs: re-crawled (superseded) and
        # tombstoned committed docs leave the corpus counts together
        removal = delta_docs.select("doc_id")
        n_removal = n_delta
        if dead_ids is not None:
            removal = removal.unionByName(dead_ids)
            n_removal += dead_ids.count()
        removed = old_doc_stats.join(removal, "doc_id", "semi")
        r = removed.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("doc_len"), F.lit(0)).alias("s")
        ).collect()[0]
        n_removed, sum_removed = int(r["n"]), float(r["s"])
        d = delta_docs.agg(F.coalesce(F.sum("doc_len"), F.lit(0)).alias("s")).collect()[0]
        n_docs = old_n - n_removed + n_delta
        sum_dl = old_sum - sum_removed + float(d["s"])
        avgdl = sum_dl / max(1, n_docs)

        # ---- merge: decode ONLY touched buckets' blocks, drop re-crawled
        # docs' stale rows, union with the delta, re-encode those buckets.
        # The new blocks are staged to a scratch dir then swapped in per
        # bucket (reading and overwriting the same parquet path in one job is
        # both disallowed and unsafe).
        old_blocks = spark.read.parquet(f"{out}/postings").filter(
            F.col("bucket").isin(buckets)
        )
        old_rows = decode_postings_to_runs(
            old_blocks, quantize_norms=self.conf.quantize_norms
        ).join(
            # removal = re-crawled delta docs + tombstoned committed docs —
            # the broadcast guard must count BOTH (delete_by_query can make
            # dead_ids arbitrarily large with a tiny crawl delta)
            F.broadcast(removal) if n_removal < 1_000_000 else removal,
            "doc_id",
            "left_anti",
        ).persist()
        n_old_rows = old_rows.count()
        n_delta_rows = delta_runs.count()
        # old rows come back hash-keyed from the block decode; hash the delta
        # the same way so the merge shuffle carries fixed-width keys only.
        # Collision resolution runs BEFORE the merge, against the committed
        # dictionary: existing terms keep their on-disk keys, a new delta
        # term whose xxhash64 clashes with any committed or sibling key is
        # remapped — never silently merged into a stranger's postings.
        from webindex.build import resolve_term_hashes, term_hash_col, term_hash_expr

        old_dict = spark.read.parquet(f"{out}/term_stats").select(
            "term", "term_hash"
        )
        term_dict, remap = resolve_term_hashes(
            delta_runs.select("term"),
            existing_dict=old_dict,
            primary_fn=self.hash_primary_fn,
        )
        # remap covers only NEW colliding terms; an EXISTING term whose
        # committed key diverges from its primary hash (remapped at an earlier
        # compact) must also override — otherwise its delta rows would hash to
        # the PRIMARY value, which is exactly the colliding committed term's
        # key, silently merging into a stranger's postings. Divergent set is
        # O(total collisions ever) ~ 0-3 at 10^9 vocab; cap guards degeneracy.
        primary = (self.hash_primary_fn or term_hash_col)(F.col("term"))
        divergent = (
            old_dict.filter(F.col("term_hash") != primary).limit(1001).collect()
        )
        if len(divergent) > 1000:
            raise RuntimeError(
                "more than 1000 committed terms have remapped keys — the "
                "term hash is degenerate; rebuild with a sound hash"
            )
        remap = {**remap, **{r["term"]: int(r["term_hash"]) for r in divergent}}
        delta_cols = ["doc_id", "tf", "doc_len"] + (
            ["positions"] if self.positions else []
        )
        merged = old_rows.unionByName(
            delta_runs.filter(F.col("term") != DOC_MARKER).select(
                term_hash_expr(F.col("term"), remap, self.hash_primary_fn).alias(
                    "term_hash"
                ),
                *delta_cols,
            )
        )
        staging = f"{out}/_postings_staging"
        ds_staging = f"{out}/_doc_stats_staging"
        # doc_stats delta frame (old kept - recrawled + delta); both staging
        # writes read only COMMITTED tables + persisted deltas, so they are
        # independent jobs — overlap them (guide §2.6, round 6) and only
        # then raise the commit fence and swap. This also SHRINKS the fence
        # window: previously the doc_stats staging write ran inside it.
        delta_urls = doc_urls.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy(F.desc("batch_id"))),
        ).filter(F.col("rn") == 1).select("doc_id", "url")
        delta_stats = delta_docs.join(delta_urls, "doc_id").select(
            "doc_id", "url", F.col("doc_len").cast("int").alias("doc_len")
        )
        kept_old = (
            old_doc_stats.filter(F.col("bucket").isin(buckets))
            .join(removal, "doc_id", "left_anti")
            .select("doc_id", "url", "doc_len")
        )

        def _stage_postings() -> None:
            build_postings(
                merged,
                avgdl,
                self.conf,
                range_width,
                n_docs=n_docs,
                id_space="hash",
                bucket_bits=bits,
            ).sortWithinPartitions("bucket", "term_hash", "block_id").write.mode(
                "overwrite"
            ).partitionBy("bucket").parquet(staging)

        def _stage_doc_stats() -> None:
            kept_old.unionByName(delta_stats).withColumn(
                "bucket", bcol
            ).sortWithinPartitions("doc_id").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(ds_staging)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [
                pool.submit(_stage_postings),
                pool.submit(_stage_doc_stats),
            ]:
                fut.result()
        old_rows.unpersist()
        # commit fence: from the first table swap to the state write the
        # committed tables and the state counts can disagree; a crash inside
        # this window must be detected (compact() raises and directs to
        # full=True), never silently re-run — the re-run would count
        # already-swapped delta docs as removals and corrupt n_docs/sum_dl
        fence_fs, fence_jvm = _hadoop_fs(spark, self.workdir)
        fence = fence_jvm.org.apache.hadoop.fs.Path(
            f"{self.workdir}/_compact_pending"
        )
        fence_fs.mkdirs(fence)
        # swap touched dirs; a touched bucket with no output (all its docs
        # re-crawled to empty) gets its stale dir dropped
        _swap_partition_dirs(spark, staging, f"{out}/postings", set(buckets))
        # same stale set as the postings swap: a touched bucket whose every
        # doc was deleted produces no staged doc_stats dir, and keeping the
        # old dir would leave ghost rows that double-decrement n_docs/sum_dl
        # on a later removal semi-join
        _swap_partition_dirs(spark, ds_staging, f"{out}/doc_stats", set(buckets))

        # term_stats: recompute from block metadata (tiny scan of the
        # committed table — column pruning never touches the binary columns).
        # The term dictionary never re-reads history: old term_stats already
        # maps every pre-existing hash, the delta contributes only its vocab.
        # term_dict was resolved pre-merge (existing keys preserved, delta
        # collisions remapped) — unique over the union by construction
        self._finish_tables(n_docs, term_dict)
        from webindex.io import write_driver_table

        write_driver_table(
            spark, [(n_docs, avgdl, -1)], schema.CORPUS_STATS,
            f"{out}/corpus_stats", fmt="parquet",
        )
        self._write_state(max(done), bits, range_width, n_docs, sum_dl)
        fence_fs.delete(fence, True)  # tables and state agree again
        self._log_compaction(
            delta_batches,
            "incremental",
            delta_rows=n_delta_rows,
            old_rows=n_old_rows,
            touched=len(buckets),
        )
        delta_runs.unpersist(); delta_docs.unpersist()
        if dead_ids is not None:
            dead_ids.unpersist()
        return self._load_index(n_docs, avgdl, range_width, bits)

    def _log_compaction(
        self, batches: list[int], kind: str, *, delta_rows: int, old_rows: int, touched: int
    ) -> None:
        from webindex.io import append_driver_rows

        append_driver_rows(
            self.spark,
            [(kind, ",".join(map(str, batches)), int(delta_rows), int(old_rows), int(touched))],
            "kind string, batches string, delta_rows long, decoded_old_rows long, touched_buckets long",
            f"{self.workdir}/compactions",
            fmt="parquet",
        )
