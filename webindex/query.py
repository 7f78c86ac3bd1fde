"""Top-k BM25 query path: exhaustive scoring + distributed block-max WAND.

Generalizes the reference's query lifecycle (reference:
src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306 — multi_match query,
BM25-ranked hits, top-1 read) to arbitrary k over our native index:

    query string -> tokenize (same analyzer as build)
      -> term_stats lookup (idf per query term; tiny -> collected/broadcast)
      -> candidate posting blocks (filter term IN (...) — partition/file
         pruning on the term-partitioned postings table)
      -> [WAND] bucket-level upper-bound pruning against threshold θ
      -> decode blocks (numpy varint) + BM25 contributions
      -> per-doc deterministic sum (term-ascending order, float64)
      -> orderBy(score desc, doc_id asc).limit(k)  => TakeOrderedAndProject

Determinism: contributions are summed per doc in term-ascending order via
sort_array(collect_list(struct(term, contrib))) + aggregate() — float addition
order is fixed regardless of partitioning, so scores are bit-identical at any
cluster size and equal to the oracle's.

Block-max WAND, distributed (SURVEY.md §2.5 T3): classic BMW advances aligned
cursors; a batch engine gets the same pruning from the range-bucketed layout:
every posting block lives in a doc-range bucket (build.py), so the per-bucket
upper bound  UB(bucket) = Σ_t idf_t · max(max_impact of t's blocks in bucket)
is computable with one tiny groupBy over block *metadata* (no decode). Buckets
with UB < θ cannot contain a top-k doc and are dropped before any decode; docs
in surviving buckets are scored exactly (all their terms' blocks in that
bucket survive together => no partial-score corruption). θ is seeded from the
rarest query term: its k-th largest single-term contribution is a valid lower
bound on the final k-th best score. Everything is metadata-scale — nothing is
collected to the driver except k rows and per-term stats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from webindex import codec
from webindex.build import Index
from webindex.textproc import tokenize

_DECODED = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("contrib", T.DoubleType(), False),
    ]
)


def _query_terms(index: Index, query: str) -> dict[str, float]:
    """{term: idf} for query terms present in the corpus (duplicates dedup'd,
    matching Lucene's per-field term dedup in multi_match)."""
    terms = sorted(set(tokenize(query)))
    if not terms:
        return {}
    rows = index.term_stats.filter(F.col("term").isin(terms)).collect()
    return {r["term"]: float(r["idf"]) for r in rows}


def _decode_score_iter(idf_map: dict[str, float], conf, avgdl: float):
    """mapInPandas fn over posting-block rows -> (term, doc_id, contrib)."""
    k1, b = conf.k1, conf.b

    def fn(batches):
        for pdf in batches:
            terms_out, ids_out, contribs_out = [], [], []
            for term, dbuf, tbuf, lbuf in zip(
                pdf["term"], pdf["doc_ids"], pdf["tfs"], pdf["doc_lens"]
            ):
                ids, tfs, dls = codec.decode_block(bytes(dbuf), bytes(tbuf), bytes(lbuf))
                contrib = idf_map[term] * codec.bm25_impact(tfs, dls, avgdl, k1, b)
                terms_out.append(np.full(len(ids), term, dtype=object))
                ids_out.append(ids)
                contribs_out.append(contrib)
            if ids_out:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(ids_out),
                        "contrib": np.concatenate(contribs_out),
                    }
                )
            else:
                yield pd.DataFrame({"term": [], "doc_id": [], "contrib": []})

    return fn


def _sum_and_topk(contribs: DataFrame, k: int) -> DataFrame:
    """Deterministic per-doc sum (term-asc order) then global top-k."""
    scored = contribs.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def topk_exact(index: Index, query: str, k: int = 10) -> DataFrame:
    """Exhaustive scoring of every candidate posting (the internal
    cross-check for WAND; also the fallback for tiny term sets)."""
    spark = index.postings.sparkSession
    idf_map = _query_terms(index, query)
    if not idf_map:
        return spark.createDataFrame(
            [], "doc_id long, score double"
        )
    blocks = index.postings.filter(F.col("term").isin(list(idf_map)))
    contribs = blocks.mapInPandas(
        _decode_score_iter(idf_map, index.conf, index.avgdl), schema=_DECODED
    )
    return _sum_and_topk(contribs, k)


def topk_wand(index: Index, query: str, k: int = 10) -> DataFrame:
    """Block-max WAND top-k (distributed bucket-level pruning; see module
    docstring). Result is always identical to topk_exact."""
    spark = index.postings.sparkSession
    idf_map = _query_terms(index, query)
    if not idf_map:
        return spark.createDataFrame([], "doc_id long, score double")
    terms = list(idf_map)
    blocks = index.postings.filter(F.col("term").isin(terms))

    # θ seed: k-th largest single-term contribution of the rarest term.
    rarest = (
        index.term_stats.filter(F.col("term").isin(terms))
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(1)
        .collect()
    )
    theta = 0.0
    if rarest:
        rterm = rarest[0]["term"]
        seed_contribs = blocks.filter(F.col("term") == rterm).mapInPandas(
            _decode_score_iter({rterm: idf_map[rterm]}, index.conf, index.avgdl),
            schema=_DECODED,
        )
        kth = seed_contribs.orderBy(F.desc("contrib")).limit(k).collect()
        if len(kth) == k:
            theta = float(kth[-1]["contrib"])

    # Bucket-level upper bounds from block METADATA only (no decode).
    idf_expr = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(idf_map[t]))]
    )
    meta = blocks.select(
        F.floor(F.col("min_doc") / F.lit(index.range_width)).alias("bucket"),
        "term",
        (idf_expr[F.col("term")] * F.col("max_impact")).alias("ub_contrib"),
    )
    bucket_ub = (
        meta.groupBy("bucket", "term")
        .agg(F.max("ub_contrib").alias("term_ub"))
        .groupBy("bucket")
        .agg(F.sum("term_ub").alias("ub"))
        .filter(F.col("ub") >= F.lit(theta))
        .select("bucket")
    )

    surviving = blocks.join(
        F.broadcast(bucket_ub),
        F.floor(F.col("min_doc") / F.lit(index.range_width)) == F.col("bucket"),
        "left_semi",
    )
    contribs = surviving.mapInPandas(
        _decode_score_iter(idf_map, index.conf, index.avgdl), schema=_DECODED
    )
    return _sum_and_topk(contribs, k)


def topk(index: Index, query: str, k: int = 10, exact: bool = False) -> DataFrame:
    """Public entry: (doc_id, score), rank order = score desc, doc_id asc."""
    return topk_exact(index, query, k) if exact else topk_wand(index, query, k)


def topk_with_urls(index: Index, query: str, k: int = 10, exact: bool = False) -> DataFrame:
    hits = topk(index, query, k, exact)
    return (
        hits.join(index.doc_stats.select("doc_id", "url"), "doc_id", "left")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "url", "score")
    )
