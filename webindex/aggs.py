"""ES-style aggregations served from the native index: a constant-score
match filter resolved from posting blocks, composed with stored-field
aggregations (the `terms` and `histogram` aggregation shapes).

The reference's ES backend serves aggregation/search reads over the same
index as relevance queries (reference:
src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306). At 100 TB the point
of doing this from the index is that the FILTER never scans text: the
query terms' posting blocks are a pruned columnar scan (term_hash IN (...)
pushdown), matching doc_ids come out as fixed-width longs, and only those
meet the stored-fields table in a doc_id-keyed join. The aggregation
output itself is tiny (field cardinality / histogram buckets), so the
whole plan is one pruned scan + one keyed join + one map-side-combined
aggregate.

Buckets partition doc space (build.bucket_expr), so per-bucket unique
doc_ids are globally unique — the match filter needs NO distinct shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from webindex import codec
from webindex.build import Index
from webindex.query import _query_terms

_IDS = "doc_id long"


def matching_doc_ids(index: Index, query: str, msm: int = 1) -> DataFrame:
    """(doc_id) for docs matching at least `msm` distinct query terms — a
    constant-score `match` filter (ES filter context: no scoring work).

    One pruned block scan + per-bucket numpy unique; a doc's postings for
    every query term live in the same doc-range bucket, so bucket-local
    unique is globally unique and bucket-local term counts are exact."""
    stats = _query_terms(index, query)
    return ids_for_hashes(index, [h for (_, _, h) in stats.values()], msm)


def ids_for_hashes(index: Index, hashes: list[int], msm: int = 1) -> DataFrame:
    """(doc_id) for docs containing >= msm distinct terms from a term-hash
    set (the shared kernel for match filters and dictionary-expanded
    queries like prefix)."""
    spark = index.postings.sparkSession
    if not hashes or msm > len(hashes):
        return spark.createDataFrame([], _IDS)
    qn = index.conf.quantize_norms

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids_all = []
        for dbuf, tbuf, lbuf in zip(pdf["doc_ids"], pdf["tfs"], pdf["doc_lens"]):
            ids, _, _ = codec.decode_block(bytes(dbuf), bytes(tbuf), bytes(lbuf), qn)
            ids_all.append(ids)
        if not ids_all:
            return pd.DataFrame({"doc_id": np.array([], dtype=np.int64)})
        ids = np.concatenate(ids_all)
        if msm > 1:
            # one row per (term, doc): multiplicity == distinct matching terms
            u, c = np.unique(ids, return_counts=True)
            u = u[c >= msm]
        else:
            u = np.unique(ids)
        return pd.DataFrame({"doc_id": u})

    blocks = index.postings.filter(F.col("term_hash").isin(hashes))
    return blocks.groupBy("bucket").applyInPandas(fn, schema=_IDS)


def significant_terms(
    index: Index,
    query: str,
    size: int = 10,
    min_doc_count: int = 3,
    msm: int = 1,
) -> DataFrame:
    """ES `significant_terms` aggregation: terms unusually frequent in the
    docs matching `query` (the foreground) relative to the whole corpus
    (the background), scored with ES's JLH heuristic

        jlh = (fgp - bgp) * (fgp / bgp)
        fgp = fg_count / fg_size,  bgp = df / n_docs

    The query's own terms are excluded (ES exposes this as the agg's
    `exclude` option; every matching doc trivially contains one, which is
    the query echoing back, not a signal). Deterministic order: jlh desc,
    term asc; terms with fg_count < min_doc_count drop (ES
    shard_min_doc_count).

    Plan (PLANS.md §7 shape, one extra aggregate over the index itself):
    the foreground doc set comes from the pruned match-filter scan; the
    per-term foreground counts come from decoding the FULL postings table
    once into (term_hash, doc_id) pairs and semi-joining the foreground
    ids — the background df and n_docs are already in term_stats, so no
    text is ever scanned. ES pays the same full-term sweep per shard; at
    100 TB both sides of the join are fixed-width longs and the output is
    vocab-sized before the top-N cut."""
    spark = index.postings.sparkSession
    fg_ids = matching_doc_ids(index, query, msm)
    fg_size = fg_ids.count()
    if fg_size == 0:
        return spark.createDataFrame(
            [], "term string, fg_count long, score double"
        )
    qn = index.conf.quantize_norms

    def pairs(batches):
        for pdf in batches:
            th_o, id_o = [], []
            for th, dbuf, tbuf, lbuf in zip(
                pdf["term_hash"], pdf["doc_ids"], pdf["tfs"], pdf["doc_lens"]
            ):
                ids, _, _ = codec.decode_block(
                    bytes(dbuf), bytes(tbuf), bytes(lbuf), qn
                )
                th_o.append(np.full(len(ids), int(th), dtype=np.int64))
                id_o.append(ids)
            yield pd.DataFrame(
                {
                    "term_hash": np.concatenate(th_o) if th_o else np.array([], dtype=np.int64),
                    "doc_id": np.concatenate(id_o) if id_o else np.array([], dtype=np.int64),
                }
            )

    fg_counts = (
        index.postings.mapInPandas(pairs, schema="term_hash long, doc_id long")
        .join(fg_ids, "doc_id")
        .groupBy("term_hash")
        .agg(F.count("*").alias("fg_count"))
    )
    exclude = [t for t in _query_terms(index, query)]
    n_docs = index.n_docs
    scored = (
        fg_counts.join(
            # vocab-sized x vocab-sized on term_hash: a plain equi-join
            # (AQE picks broadcast only when the dictionary actually fits)
            index.term_stats.select("term_hash", "term", "df"),
            "term_hash",
        )
        .filter(~F.col("term").isin(exclude))
        .filter(F.col("fg_count") >= min_doc_count)
        .withColumn("fgp", F.col("fg_count") / F.lit(float(fg_size)))
        .withColumn("bgp", F.col("df") / F.lit(float(n_docs)))
        .withColumn(
            "score",
            (F.col("fgp") - F.col("bgp")) * (F.col("fgp") / F.col("bgp")),
        )
    )
    return (
        scored.select("term", "fg_count", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
    )


def terms_agg(
    index: Index,
    stored: DataFrame,
    query: str,
    field: str,
    size: int = 10,
    msm: int = 1,
) -> DataFrame:
    """ES `terms` aggregation: top-`size` values of `field` by matching-doc
    count, for docs matching the query (filter context). `stored` is the
    stored-fields table carrying (doc_id, `field`).

    Deterministic bucket order: doc_count desc, field asc (ES's _count
    desc with a stable key tie-break)."""
    ids = matching_doc_ids(index, query, msm)
    return (
        stored.join(ids, "doc_id")
        .groupBy(field)
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc(field))
        .limit(size)
    )


def histogram_agg(
    index: Index,
    stored: DataFrame,
    query: str,
    field: str,
    interval: int,
    msm: int = 1,
) -> DataFrame:
    """ES `histogram` aggregation over a numeric stored field: bucket key =
    floor(value / interval) * interval, count of matching docs per bucket
    (empty buckets omitted, ES min_doc_count=1 behavior)."""
    ids = matching_doc_ids(index, query, msm)
    bucket = (F.floor(F.col(field) / interval) * interval).cast("long")
    return (
        stored.join(ids, "doc_id")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("bucket")
    )
