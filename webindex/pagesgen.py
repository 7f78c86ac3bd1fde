"""Deterministic synthetic `pages` corpus (FIXTURES.md §1 rules, seed=42).

The engine's authoritative input is an Iceberg/Parquet table
pages(url, warc_ts, html, text, lang). No external data is allowed, so tests
and benches synthesize it deterministically here — Zipf(s~1.1) vocabulary so
hot-term skew is real (the salted-shuffle path gets exercised), doc length
Uniform(20,200), per-doc RNG seeded by (seed + doc index) so any slice of the
corpus is reproducible independently of partitioning.

Generation is vectorized (numpy) and can run distributed via mapInPandas over
an id range (generate_pages_df) so the bench can synthesize ~50k+ docs without
a driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
BASE_TS = np.datetime64("2024-01-01T00:00:00")
LANGS = ["en", "de", "es", "fr", "zh"]

# ~200-word vocabulary, deterministic: wNNN tokens plus a recognizable head.
_HEAD = [
    "the", "data", "spark", "index", "query", "web", "page", "search",
    "table", "row", "text", "term", "doc", "score", "rank", "merge",
]
VOCAB = _HEAD + [f"w{i:03d}" for i in range(len(_HEAD), 200)]
ZIPF_S = 1.1


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


_PROBS = _zipf_probs(len(VOCAB), ZIPF_S)
_CDF = np.cumsum(_PROBS)
_VOCAB_ARR = np.array(VOCAB)


DEFAULT_TOKENS = (20, 200)  # FIXTURES.md §1 doc length range
# realistic Common-Crawl-ish page body length for perf/scaling runs
WEBLIKE_TOKENS = (200, 2000)


def make_page(i: int, seed: int = SEED, tokens_range: tuple[int, int] = DEFAULT_TOKENS) -> dict:
    """One deterministic page row for doc index i (pure per-row).
    Zipf sampling via inverse-CDF searchsorted (≈10x faster than
    rng.choice(p=...); equally deterministic given the per-doc seed)."""
    rng = np.random.default_rng(seed + i)
    n_tokens = int(rng.integers(tokens_range[0], tokens_range[1] + 1))
    toks = _VOCAB_ARR[np.searchsorted(_CDF, rng.random(n_tokens), side="right")]
    text = " ".join(toks.tolist())
    url = f"https://site{i % 1000}.example/page/{i}"
    html = (
        b"<html><head><title>T%d</title></head><body><p>" % i
        + text.encode("utf-8")
        + b"</p></body></html>"
    )
    return {
        "url": url,
        "warc_ts": (BASE_TS + np.timedelta64(i, "s")).astype("datetime64[us]"),
        "html": html,
        "text": text,
        "lang": LANGS[i % len(LANGS)],
    }


def make_pages_pdf(
    start: int, end: int, seed: int = SEED, tokens_range: tuple[int, int] = DEFAULT_TOKENS
) -> pd.DataFrame:
    """Pages for doc indices [start, end) as a pandas DataFrame."""
    rows = [make_page(i, seed, tokens_range) for i in range(start, end)]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    return pdf


def generate_pages_df(
    spark,
    n_docs: int,
    seed: int = SEED,
    partitions: int | None = None,
    tokens_range: tuple[int, int] = DEFAULT_TOKENS,
):
    """Distributed deterministic generation: mapInPandas over an id range.

    Each Spark partition generates its own id slice with per-doc seeds, so the
    result is independent of `partitions` (parallelism-invariance).
    """
    from webindex.schema import PAGES

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    ids = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if len(idx) == 0:
                continue
            out = pd.DataFrame([make_page(int(i), seed, tokens_range) for i in idx])
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return ids.mapInPandas(gen, schema=PAGES)


def pages_from_documents(spark, sf_dir: str):
    """Wrap the driver's documents.parquet as a `pages` table.

    documents(doc_id, text, lang, source, n_chars) -> pages rows with the
    fixture html skeleton, url derived from doc_id, warc_ts = base + doc_id s.
    Keeps the driver-provided corpus authoritative for correctness checks.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit("<html><head><title>T").cast("binary"),
            F.col("doc_id").cast("string").cast("binary"),
            F.lit("</title></head><body><p>").cast("binary"),
            F.encode(F.col("text"), "utf-8"),
            F.lit("</p></body></html>").cast("binary"),
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
