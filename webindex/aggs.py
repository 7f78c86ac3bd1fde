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
