"""Benchmark harness (driver contract): runs the headline workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
  build_docs      index build over the sf dir's documents corpus (html path:
                  extraction + tokenize + SPIMI + compress, written to disk)
  build_synth100k index build over a 100k-doc deterministic synthetic pages
                  table (bigger corpus => the shuffle/encode path dominates)
  query_p50/p95   BM25 block-max-WAND top-10 latency over the synth index
                  (10-query reference set: hot/rare/multi/absent)
  dedup_minhash   MinHash-LSH candidate pairs over documents
  cosine_topk     brute-force cosine top-10 over embeddings
Throughputs (docs/sec) for the builds are included as extra keys.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

QUERY_SET = [
    "the", "data", "the data spark", "w199 merge", "index query search",
    "w180", "rank score", "the w150", "web page text", "absentterm42",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from webindex.build import build_index
    from webindex.pagesgen import generate_pages_df, pages_from_documents
    from webindex.query import topk_wand
    from webindex.session import get_spark

    spark = get_spark(app="webindex-bench", master=f"local[{cpus}]", driver_mem="48g")
    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="webindex_bench_")

    try:
        # -- build over the driver-provided corpus (html extraction path) ----
        # Builds and queries run best-of-2: the sandbox is a shared VM whose
        # available throughput swings ~3x between windows (measured: the same
        # 100k build 16s vs 45s half an hour apart); min over repeats measures
        # the job, not the VM. Variance record: BENCH/BASELINE.md.
        pages = pages_from_documents(spark, sf_dir)
        n_docs_sf = pages.count()
        reps = []
        for _ in range(2):
            t0 = time.monotonic()
            build_index(
                spark, pages, text_col="html", doc_id_method="hash",
                out_dir=f"{workdir}/idx_docs",
            )
            reps.append(time.monotonic() - t0)
        timings["build_docs"] = min(reps)
        timings["build_docs_docs_per_sec"] = round(n_docs_sf / timings["build_docs"], 1)

        # -- build over a 100k synthetic pages table --------------------------
        # (materialized to parquet first: we time the BUILD, not the python
        # corpus generator)
        n_synth = 100_000
        generate_pages_df(spark, n_synth).write.mode("overwrite").parquet(
            f"{workdir}/pages_synth"
        )
        synth = spark.read.parquet(f"{workdir}/pages_synth")
        reps = []
        for _ in range(2):
            t0 = time.monotonic()
            idx = build_index(
                spark, synth, text_col="html", doc_id_method="hash",
                out_dir=f"{workdir}/idx_synth",
            )
            reps.append(time.monotonic() - t0)
        timings["build_synth100k"] = min(reps)
        timings["build_synth100k_docs_per_sec"] = round(n_synth / timings["build_synth100k"], 1)

        # -- query latency over the synth index -------------------------------
        # Best-of-2 per query: the sandbox is a shared VM with multi-second
        # stalls; a single-shot p95 measures the VM, not the job. Min over
        # repeats is the standard way to isolate the job's cost.
        topk_wand(idx, "warmup run", 10).collect()  # python-worker/file-list warmup
        lat = []
        for q in QUERY_SET:
            per_rep = []
            for _ in range(2):
                t0 = time.monotonic()
                topk_wand(idx, q, 10).collect()
                per_rep.append(time.monotonic() - t0)
            lat.append(min(per_rep))
        lat.sort()
        timings["query_p50"] = lat[len(lat) // 2]
        timings["query_p95"] = lat[min(len(lat) - 1, int(len(lat) * 0.95))]
        timings["query_mean"] = sum(lat) / len(lat)

        # batched query-log evaluation (one job for the whole set)
        from webindex.query import topk_batch

        t0 = time.monotonic()
        topk_batch(idx, {f"q{i}": q for i, q in enumerate(QUERY_SET)}, 10).collect()
        timings["query_batch_all"] = time.monotonic() - t0
        timings["query_batch_qps"] = round(len(QUERY_SET) / timings["query_batch_all"], 1)

        # -- dedup + simsearch -------------------------------------------------
        from webindex.dedup import lsh_candidate_pairs, minhash_signatures

        # single-file parquet reads as ONE partition — spread it first
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
            spark.sparkContext.defaultParallelism
        )
        t0 = time.monotonic()
        sigs = minhash_signatures(docs, n_hashes=16)
        lsh_candidate_pairs(sigs, n_bands=4).count()
        timings["dedup_minhash"] = time.monotonic() - t0

        from pyspark.sql import functions as F

        from webindex.simsearch import cosine_topk_bruteforce

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        t0 = time.monotonic()
        cosine_topk_bruteforce(emb, qvec, k=10).collect()
        timings["cosine_topk"] = time.monotonic() - t0

        # -- positional build + phrase queries (informational extras) --------
        # Excluded from the headline total so `value` stays the SAME workload
        # set as rounds 1-2 (cross-round comparability); reported as extra
        # keys. Single-shot build (small corpus), best-of-2 queries.
        from webindex.fsutil import dir_bytes
        from webindex.query import topk_phrase

        extras: dict[str, float] = {}
        t0 = time.monotonic()
        pidx = build_index(
            spark, pages, text_col="html", doc_id_method="hash",
            out_dir=f"{workdir}/idx_docs_pos", positions=True,
        )
        extras["build_docs_positional"] = time.monotonic() - t0
        plain_b = dir_bytes(spark, f"{workdir}/idx_docs/postings")
        pos_b = dir_bytes(spark, f"{workdir}/idx_docs_pos/postings")
        extras["positions_size_ratio"] = round(pos_b / max(1, plain_b), 3)
        plat = []
        for p in ["the data", "data the", "spark merge"]:
            per = []
            for _ in range(2):
                t0 = time.monotonic()
                topk_phrase(pidx, p, 10).collect()
                per.append(time.monotonic() - t0)
            plat.append(min(per))
        plat.sort()
        extras["phrase_p50"] = plat[len(plat) // 2]
        # sloppy phrase (round 4): same phrases at slop=2
        from webindex.query import topk_phrase_batch

        slat = []
        for p in ["the data", "data the", "spark merge"]:
            per = []
            for _ in range(2):
                t0 = time.monotonic()
                topk_phrase(pidx, p, 10, slop=2).collect()
                per.append(time.monotonic() - t0)
            slat.append(min(per))
        slat.sort()
        extras["phrase_slop_p50"] = slat[len(slat) // 2]
        # batch phrase: all phrases in ONE job vs 3 per-query jobs
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_phrase_batch(
                pidx,
                {"p1": "the data", "p2": "data the", "p3": "spark merge"},
                k=10,
            ).collect()
            per.append(time.monotonic() - t0)
        extras["phrase_batch_all"] = min(per)
        # match operator=and (round 4): conjunctive queries on the plain
        # index — the msm coverage prune working set
        from webindex.query import topk_match

        mlat = []
        for q in ["the data", "spark merge index", "data the scan"]:
            per = []
            for _ in range(2):
                t0 = time.monotonic()
                topk_match(idx, q, 10, operator="and").collect()
                per.append(time.monotonic() - t0)
            mlat.append(min(per))
        mlat.sort()
        extras["match_and_p50"] = mlat[len(mlat) // 2]
        # round-4 ES-surface family (informational): bool compound, fuzzy
        # dictionary expansion, phrase-prefix autocomplete, terms agg
        from webindex.aggs import terms_agg
        from webindex.query import topk_bool, topk_fuzzy, topk_phrase_prefix

        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_bool(
                idx, must="data", should="spark merge", must_not="w199",
                filter_="the", k=10,
            ).collect()
            per.append(time.monotonic() - t0)
        extras["bool_query"] = min(per)
        # fuzzy_query stays the LINEAR dictionary pass (r3/r4-comparable);
        # fuzzy_query_gram is the round-5 q-gram-sidecar path on the same
        # word (same results by contract, pruned dictionary touch)
        _tg, idx.term_grams = idx.term_grams, None
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_fuzzy(idx, "merge", 10).collect()
            per.append(time.monotonic() - t0)
        extras["fuzzy_query"] = min(per)
        idx.term_grams = _tg
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_fuzzy(idx, "merge", 10).collect()
            per.append(time.monotonic() - t0)
        extras["fuzzy_query_gram"] = min(per)
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_phrase_prefix(pidx, "the s", 10).collect()
            per.append(time.monotonic() - t0)
        extras["phrase_prefix_query"] = min(per)
        stored = pages.select(F.xxhash64("url").alias("doc_id"), "lang")
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            terms_agg(idx, stored, "data merge", "lang", size=10).collect()
            per.append(time.monotonic() - t0)
        extras["terms_agg"] = min(per)
        # late-round-4 compositions (informational): window rescoring,
        # simple_query_string, query-time synonyms
        from webindex.query import simple_query_string, topk_rescore, topk_synonyms

        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_rescore(
                pidx, "data merge", "the data", window=100,
                rescore_weight=2.0, k=10,
            ).collect()
            per.append(time.monotonic() - t0)
        extras["rescore_query"] = min(per)
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            simple_query_string(pidx, 'data "the data" -w199', k=10).collect()
            per.append(time.monotonic() - t0)
        extras["sqs_query"] = min(per)
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            topk_synonyms(idx, "data merge", {"data": ["spark"]}, 10).collect()
            per.append(time.monotonic() - t0)
        extras["synonyms_query"] = min(per)
        # round-5 families (informational): intervals rule tree over the
        # positional index; cross-doc exact-substring duplication stats
        from webindex.dedup import dup_span_stats
        from webindex.query import intervals_docs

        per = []
        for _ in range(2):
            t0 = time.monotonic()
            intervals_docs(
                pidx,
                {"all_of": {"max_gaps": 4, "ordered": True, "intervals": [
                    {"match": {"terms": ["the", "data"], "max_gaps": 0,
                               "ordered": True}},
                    {"match": {"terms": ["merge"]}},
                ]}},
            ).count()
            per.append(time.monotonic() - t0)
        extras["intervals_query"] = min(per)
        per = []
        for _ in range(2):
            t0 = time.monotonic()
            dup_span_stats(docs, k=5).count()
            per.append(time.monotonic() - t0)
        extras["dedup_exact_substr"] = min(per)

        total = sum(
            v
            for k, v in timings.items()
            if not (k.endswith("docs_per_sec") or k.endswith("_qps"))
        )
        timings.update(extras)
        print(
            json.dumps(
                {
                    "metric": "webindex headline: index build + BM25 WAND top-k + dedup + simsearch",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": {k: round(v, 3) for k, v in timings.items()},
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
