"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, plus an LSH-bucketed
variant (random-hyperplane signs) as the scale path — at 10^12 vectors the
cross join is impossible; sign-LSH reduces candidates by 2^n_planes.

The dot products stay JVM-side via F.zip_with + F.aggregate (codegen'd,
no Python). Deterministic: hyperplanes derive from a seeded RNG; summation is
left-to-right sequential inside aggregate() in both query and corpus order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cos) top-k by cosine vs one query vector. The query vector is
    a literal array (broadcast by construction — no shuffle except TakeOrdered).
    Ties broken by vec_id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    v = F.col(vec_col)
    # dot and norm are interpreted higher-order aggregates (CodegenFallback,
    # no common-subexpression elimination), so referencing _norm(v) twice in
    # one expression walks the array twice. Projecting each aggregate ONCE in
    # a separate select halves the per-row array walks (3 -> 2);
    # CollapseProject keeps the split because the aliases are non-cheap and
    # multiply-referenced (SPARK-36718). Same expressions, same evaluation
    # order per element -> bit-identical cosines.
    pre = vectors.select(
        F.col(id_col).alias("vec_id"),
        _dot(v, q).alias("_d"),
        _norm(v).alias("_n"),
    )
    cos = F.when(
        (F.col("_n") > 0) & (F.lit(qn) > 0), F.col("_d") / (F.col("_n") * F.lit(qn))
    ).otherwise(F.lit(0.0))
    return (
        pre.select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-LSH bucket id: bit i = sign(v . plane_i). Pure column expr."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(_dot(F.col(vec_col), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH bucket is within
    probe_hamming bits of the query's bucket (multi-probe). At scale the
    bucket column is precomputed+partitioned; here it's inline."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = sum((1 << i) for i, p in enumerate(planes) if float(qv @ p) >= 0)
    probes = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qbucket).count("1") <= probe_hamming
    ]
    bucketed = vectors.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def band_buckets_udf(planes: "np.ndarray", n_bands: int, rows_per_band: int):
    """Vectorized pandas UDF: one numpy matmul per Arrow batch computes ALL
    plane dot-signs, then packs each band's rows_per_band sign bits into a
    bucket int. At 10^12 vectors this is the hot loop — a single BLAS GEMM
    per batch instead of n_bands*rows_per_band column expressions (which blow
    past Catalyst's codegen limits at wide configs)."""
    import pandas as pd
    from pyspark.sql import types as T

    P = np.ascontiguousarray(planes, dtype=np.float64)  # (n_bands*r, dim)
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    def fn(vecs):
        # no type hints: `from __future__ import annotations` stringifies
        # them, which breaks pandas_udf signature inference
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, dim)
        bits = (M @ P.T) >= 0.0  # (n, n_bands*r)
        bits = bits.reshape(len(vecs), n_bands, rows_per_band)
        buckets = (bits * weights).sum(axis=2).astype(np.int64)  # (n, n_bands)
        return pd.Series(list(buckets))

    return F.pandas_udf(fn, T.ArrayType(T.LongType()))


def all_pairs_above(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    n_bands: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded sign-LSH self-join (equi-join
    on (band, bucket)) then exact cosine filter — the n^2 explosion is
    contained per bucket, and the physical plan is a shuffle hash join, never
    a cartesian product.

    n_bands=1 is classic single-table LSH (all n_planes must agree). Banding
    (n_bands>1, each of n_planes rows) trades candidate volume for recall:
    P(miss) = (1 - p^n_planes)^n_bands with p = 1 - theta/pi, so low
    thresholds need many narrow bands. max_bucket drops degenerate buckets
    (skew guard, same trade as lsh_candidate_pairs — disabled by default so
    small exact comparisons stay exact)."""
    # NULL embeddings carry no signal and would crash the banding UDF's
    # np.stack; drop them up front (the brute-force oracle path scores them
    # cos=0, below any useful threshold — same verdict, no crash)
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    first = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes_arr = hyperplanes(dim, n_planes * n_bands, seed)
    bb = band_buckets_udf(planes_arr, n_bands, n_planes)
    # the vector's norm is a per-VECTOR quantity: computing it here, before
    # the band explode and the bucket self-join, costs one interpreted array
    # walk per (vector, band) row instead of TWO walks per candidate pair
    # (guard + divisor) on both sides of the join — the dominant cost of the
    # old plan, where the threshold predicate is inlined into the join
    # condition and re-evaluated the norms for every candidate pair. Same
    # aggregate expression over the same array -> bit-identical values.
    bucketed = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
        F.posexplode(bb(F.col(vec_col))).alias("band", "bucket"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        bucketed = bucketed.withColumn(
            "bsize", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        ).filter(F.col("bsize") <= max_bucket)
    a = bucketed.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"),
        F.col("n").alias("na"), "band", "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), "band", "bucket",
    )
    # cosine + threshold are applied BEFORE the pair dedup: a pair surfacing
    # in several bands recomputes the (cheap, JVM-side) cosine per band, but
    # the dedup shuffle then carries only (a, b, cos) — 24 bytes — instead of
    # two full embedding vectors per candidate row. cos is a pure function of
    # (a, b), so dropDuplicates stays deterministic.
    # zero-norm guard: under Spark 4's default ANSI mode 0/0 is a hard
    # DIVIDE_BY_ZERO error, and sign-LSH puts ALL zero vectors in one
    # bucket (0 >= 0 sets every bit), so padding vectors would abort the
    # job; define their cosine as 0 like cosine_topk_bruteforce does
    cos = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .dropDuplicates(["a", "b"])
    )


def rrf_hybrid(
    index,
    vectors: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    rank_constant: int = 60,
    window: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    weights: tuple[float, float] = (1.0, 1.0),
) -> DataFrame:
    """ES 8.8 hybrid search with reciprocal rank fusion (`rank: {rrf}`):
    fuse the BM25 ranking of `query` with the cosine-kNN ranking of
    `query_vec` by

        rrf(doc) = Σ over rankings r of w_r / (rank_constant + rank_r(doc))

    `weights` = (w_text, w_knn) is ES's weighted RRF (the rrf retriever's
    per-child `weight`, ES 8.18): each ranking's reciprocal-rank
    contribution is scaled before the sum — (1, 1) is classic RRF

    where rank_r is the doc's 1-based position in ranking r and docs absent
    from a ranking contribute nothing for it — exactly ES's rank_window_size
    contract: only each ranking's top-`window` candidates are fused, and the
    final top-k comes from their union. Ties break by doc_id asc (rrf scores
    collide whenever two docs hold mirror-image ranks, so the tiebreak is
    load-bearing).

    Both constituent rankings keep their own pruned plans (block-max WAND /
    broadcast-literal cosine + TakeOrdered); the fuse joins two
    window-sized fixed-width frames — coordinator-scale, like ES.
    Output (doc_id, score), score desc / doc_id asc."""
    from pyspark.sql import Window as W

    from webindex.query import topk_wand

    if not (0 < k <= window):
        raise ValueError("need 0 < k <= window")
    rc = float(rank_constant)
    w_text, w_knn = float(weights[0]), float(weights[1])
    text = topk_wand(index, query, window).withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc_id")))
    )
    knn = cosine_topk_bruteforce(vectors, query_vec, window, id_col, vec_col)
    knn = knn.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("cos"), F.asc("vec_id")))
    ).withColumnRenamed("vec_id", "doc_id")
    t = text.select(
        "doc_id", (F.lit(w_text) / (F.lit(rc) + F.col("r"))).alias("a")
    )
    v = knn.select(
        "doc_id", (F.lit(w_knn) / (F.lit(rc) + F.col("r"))).alias("b")
    )
    return (
        t.join(v, "doc_id", "full")
        .select(
            "doc_id",
            (F.coalesce(F.col("a"), F.lit(0.0)) + F.coalesce(F.col("b"), F.lit(0.0))).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def cosine_topk_filtered(
    index,
    vectors: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    msm: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES `knn` with `filter`: cosine top-k restricted to docs matching the
    text filter (>= msm query terms) — ES applies the filter DURING the knn
    search so the result always has k matching docs (not a post-filter of
    an unrestricted top-k); so does this: the match-set ids (fixed-width
    doc_id longs from block metadata + decode, no text scan) semi-join the
    vector table BEFORE the cosine/TakeOrdered. Ties vec_id asc.

    At scale the semi-join is doc_id-keyed and AQE-eligible (a selective
    filter broadcasts); the cosine stays a broadcast-literal JVM expression
    on the surviving rows only."""
    from webindex.aggs import matching_doc_ids

    ids = matching_doc_ids(index, query, msm)
    filtered = vectors.join(
        ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
    return cosine_topk_bruteforce(filtered, query_vec, k, id_col, vec_col)
