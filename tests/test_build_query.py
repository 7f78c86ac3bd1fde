"""End-to-end Spark build + query vs oracle: posting-list content, BM25
scores, rank-identity for k in {1,10,100}, WAND==exact, ties, empty queries
(SURVEY.md §5.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex import codec
from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk, topk_exact, topk_wand

N_DOCS = 300

QUERIES = [
    "the",                # Zipf-head hot term
    "w199",               # rare tail term
    "zzz_absent",         # not in corpus
    "spark index query",  # multi-term
    "The DATA",           # case variant
    "data data data",     # duplicate terms
    "the w180 merge",     # hot + rare mix
]


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    pages = spark.createDataFrame(pdf).repartition(7)
    # small range_width so multiple buckets exist even on 300 docs
    index = build_index(
        spark, pages, text_col="html", doc_id_method="provided", range_width=64
    )
    oracle = OracleIndex({i: pdf["text"][i] for i in range(N_DOCS)})
    yield index, oracle
    index.postings.sparkSession.catalog.clearCache()


def test_corpus_stats_match(corpus):
    index, oracle = corpus
    assert index.n_docs == oracle.n_docs
    assert abs(index.avgdl - oracle.avgdl) < 1e-9


def test_term_stats_match(corpus):
    index, oracle = corpus
    rows = index.term_stats.collect()
    assert len(rows) == len(oracle.postings)
    for r in rows:
        assert r["df"] == oracle.df(r["term"]), r["term"]
        assert abs(r["idf"] - oracle.idf(r["term"])) < 1e-12


def test_postings_content_match(corpus):
    """Decode every block of a few terms; postings == oracle's exactly."""
    from webindex.build import term_hashes

    index, oracle = corpus
    hashes = term_hashes(index.postings.sparkSession, ["the", "data", "w199"])
    for term in ("the", "data", "w199"):
        rows = (
            index.postings.filter(F.col("term_hash") == hashes[term])
            .orderBy("block_id")
            .collect()
        )
        ids, tfs = [], []
        for r in rows:
            d, t, _ = codec.decode_block(bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["doc_lens"]))
            ids.extend(d.tolist())
            tfs.extend(t.tolist())
        expect = oracle.postings.get(term, [])
        assert ids == [d for d, _ in expect]
        assert tfs == [tf for _, tf in expect]
        assert ids == sorted(ids)


def test_block_ids_follow_doc_ranges(corpus):
    from webindex.build import term_hashes

    index, _ = corpus
    h = term_hashes(index.postings.sparkSession, ["the"])["the"]
    rows = index.postings.filter(F.col("term_hash") == h).collect()
    for r in rows:
        # block lives entirely inside one range bucket (range_width=64)
        assert r["min_doc"] // 64 == r["max_doc"] // 64


@pytest.mark.parametrize("k", [1, 10, 100])
def test_rank_identity_vs_oracle(corpus, k):
    index, oracle = corpus
    for q in QUERIES:
        got = [(r["doc_id"], r["score"]) for r in topk_exact(index, q, k).collect()]
        exp = oracle.topk(q, k)
        assert [d for d, _ in got] == [d for d, _ in exp], f"docids diff for {q!r} k={k}"
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6, f"score diff for {q!r}"


@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_equals_exact(corpus, k):
    index, _ = corpus
    for q in QUERIES:
        # seed_min_blocks=0 forces θ seeding past the cost gate so the
        # pruning path is actually exercised on this small fixture
        w = [
            (r["doc_id"], round(r["score"], 10))
            for r in topk_wand(index, q, k, seed_min_blocks=0).collect()
        ]
        e = [(r["doc_id"], round(r["score"], 10)) for r in topk_exact(index, q, k).collect()]
        assert w == e, f"WAND != exact for {q!r} k={k}"


def test_empty_query(corpus):
    index, _ = corpus
    assert topk(index, "", 10).count() == 0
    assert topk(index, "!!! ???", 10).count() == 0


def test_parallelism_invariance(spark):
    """Same corpus at 2 vs 13 input partitions -> byte-identical postings and
    identical query results (deterministic doc ids + range-bucketed blocks).
    Sandbox evidence for the north rule's N vs 4N cluster-size invariance."""
    pdf = make_pages_pdf(0, 120)
    pdf.insert(0, "doc_id", np.arange(120, dtype=np.int64))

    def build(npart):
        pages = spark.createDataFrame(pdf).repartition(npart)
        idx = build_index(spark, pages, text_col="html",
                          doc_id_method="provided", range_width=64)
        post = {
            (r["term_hash"], r["block_id"]): (bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["doc_lens"]), r["max_impact"])
            for r in idx.postings.collect()
        }
        hits = [(r["doc_id"], r["score"]) for r in topk(idx, "the data merge", 10).collect()]
        return post, hits

    p2, h2 = build(2)
    p13, h13 = build(13)
    assert p2 == p13
    assert h2 == h13


def test_dedup_urls_latest_crawl_wins(spark):
    """build_index(dedup_urls=True): re-crawled urls keep only the newest
    warc_ts version — no hybrid documents, df counts each doc once."""
    import datetime as dt

    rows = [
        ("https://a.example", dt.datetime(2024, 1, 1), "alpha beta"),
        ("https://a.example", dt.datetime(2024, 2, 1), "beta gamma gamma"),
        ("https://b.example", dt.datetime(2024, 1, 1), "delta"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    idx = build_index(
        spark, pages, text_col="text", doc_id_method="hash",
        range_width=1 << 18, dedup_urls=True,
    )
    assert idx.n_docs == 2
    stats = {r["term"]: r["df"] for r in idx.term_stats.collect()}
    # stale term from the old crawl is gone; new terms present once
    assert "alpha" not in stats
    assert stats == {"beta": 1, "gamma": 1, "delta": 1}
    # doc_len reflects the NEW text (3 tokens), not a hybrid
    dl = {r["url"]: r["doc_len"] for r in idx.doc_stats.collect()}
    assert dl["https://a.example"] == 3


def test_hash_doc_ids_and_url_join(spark):
    """Default doc_id path (xxhash64(url)) + topk_with_urls."""
    from webindex.query import topk_with_urls

    pdf = make_pages_pdf(0, 80)
    pages = spark.createDataFrame(pdf)
    idx = build_index(spark, pages, text_col="html", range_width=1 << 18)
    rows = topk_with_urls(idx, "the data", 5).collect()
    assert len(rows) == 5
    assert all(r["url"].startswith("https://site") for r in rows)
    # scores descending, ties by doc_id asc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_quantized_norms_end_to_end(spark, tmp_path):
    """quantize_norms=True: 1-byte doc_lens on disk, conf sidecar restores
    the flag through load_index, and query quality stays close to exact
    (quantized dl has < 12.5% error; scores shift but ranks barely move)."""
    from webindex.bm25 import BM25Config
    from webindex.build import load_index

    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    pages = spark.createDataFrame(pdf).repartition(5)

    out = str(tmp_path / "qidx")
    build_index(
        spark, pages, text_col="html", doc_id_method="provided",
        range_width=64, conf=BM25Config(quantize_norms=True), out_dir=out,
    )
    qidx = load_index(spark, out)
    assert qidx.conf.quantize_norms is True  # sidecar round-trip
    assert qidx.range_width == 64

    # on-disk doc_lens stream is exactly 1 byte per posting
    row = qidx.postings.select("n_docs", F.length("doc_lens").alias("nb")).first()
    assert row["nb"] == row["n_docs"]

    exact = build_index(
        spark, pages, text_col="html", doc_id_method="provided", range_width=64
    )
    for q in ["the", "w199", "spark index query", "the w180 merge"]:
        got = [r["doc_id"] for r in topk_wand(qidx, q, 10).collect()]
        want = [r["doc_id"] for r in topk_exact(exact, q, 10).collect()]
        assert len(got) == len(want)
        # rank quality: ordered overlap in the top half, set overlap >= 80%
        assert got[: len(got) // 2] == want[: len(want) // 2] or (
            len(set(got) & set(want)) >= int(0.8 * len(want))
        )
    # WAND on the quantized index equals exhaustive scoring on the SAME index
    for q in ["the", "spark index query"]:
        assert (
            topk_wand(qidx, q, 10).collect() == topk_exact(qidx, q, 10).collect()
        )
    assert topk_wand(qidx, "zzz_absent", 5).count() == 0


def test_load_index_corrupt_sidecar_raises(spark, tmp_path):
    """A conf sidecar that EXISTS but cannot be read must raise, not silently
    fall back to the caller's conf (ADVICE r2 medium: a quantized index read
    with the default conf would varint-decode norm bytes as garbage)."""
    from webindex.build import load_index

    pdf = make_pages_pdf(0, 20)
    pdf.insert(0, "doc_id", np.arange(20, dtype=np.int64))
    out = str(tmp_path / "sidecar_idx")
    build_index(
        spark, spark.createDataFrame(pdf), text_col="html",
        doc_id_method="provided", range_width=64, out_dir=out,
    )
    # corrupt the sidecar: existing dir, unreadable content
    import os
    import shutil

    shutil.rmtree(f"{out}/conf")
    os.makedirs(f"{out}/conf")
    with open(f"{out}/conf/part-00000.parquet", "wb") as f:
        f.write(b"this is not parquet")
    with pytest.raises(Exception):
        load_index(spark, out)

    # absent sidecar (pre-sidecar index): falls back to the caller's conf
    shutil.rmtree(f"{out}/conf")
    idx = load_index(spark, out)
    assert idx.conf.quantize_norms is False


def test_dedup_urls_deterministic_without_html(spark):
    """Review regression: (url, text)-shaped input with tied warc_ts must
    pick the same winner at ANY partitioning (content-hash tiebreak on the
    text column, not just html)."""
    rows = [
        ("u://a", "alpha beta gamma"),
        ("u://a", "delta epsilon zeta"),
        ("u://b", "eta theta"),
    ]
    winners = []
    for parts in (1, 7):
        pages = spark.createDataFrame(
            rows, "url string, text string"
        ).repartition(parts)
        idx = build_index(
            spark, pages, text_col="text", doc_id_method="hash",
            range_width=1 << 18, dedup_urls=True,
        )
        winners.append(
            sorted(
                (r["doc_id"], r["doc_len"])
                for r in idx.doc_stats.select("doc_id", "doc_len").collect()
            )
        )
    assert winners[0] == winners[1]
    assert len(winners[0]) == 2  # one doc per url


def test_duplicate_url_without_dedup_fails_loudly(spark):
    """assign_doc_ids('hash') on duplicate urls silently merges docs — the
    build must refuse unless dedup_urls handles it."""
    rows = [("u://a", "one two"), ("u://a", "three four five")]
    pages = spark.createDataFrame(rows, "url string, text string")
    with pytest.raises(RuntimeError, match="duplicate url"):
        build_index(
            spark, pages, text_col="text", doc_id_method="hash",
            range_width=1 << 18,
        )
