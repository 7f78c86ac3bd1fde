"""Randomized rank-identity sweep: seeded random corpora (unicode tokens,
empty docs, heavy duplication -> ties) built with Spark must match the
pure-Python oracle exactly. Deterministic seeds — no flaky tests."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.query import topk_exact, topk_wand

WORDS = [
    "the", "data", "spark", "über", "köln", "straße", "数据", "索引",
    "café", "naïve", "x2", "42", "a", "zz",
]


def _random_corpus(seed: int, n_docs: int) -> dict[int, str]:
    rng = random.Random(seed)
    docs = {}
    for i in range(n_docs):
        if rng.random() < 0.1:
            docs[i] = ""  # empty doc edge
        elif rng.random() < 0.2:
            docs[i] = docs.get(i - 1, "tie tie tie")  # duplicate -> score tie
        else:
            docs[i] = " ".join(rng.choices(WORDS, k=rng.randint(1, 30)))
    return docs


@pytest.mark.parametrize("seed", [1, 7, 99])
def test_random_corpus_rank_identity(spark, seed):
    docs = _random_corpus(seed, 40)
    pdf_rows = [(i, docs[i]) for i in sorted(docs)]
    pages = spark.createDataFrame(pdf_rows, "doc_id long, text string").withColumn(
        "url", F.col("doc_id").cast("string")
    )
    idx = build_index(
        spark, pages, text_col="text", doc_id_method="provided", range_width=8
    )
    oracle = OracleIndex(docs)
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avgdl - oracle.avgdl) < 1e-12

    rng = random.Random(seed + 1000)
    queries = [" ".join(rng.choices(WORDS, k=rng.randint(1, 4))) for _ in range(6)]
    queries += ["数据 the", "ÜBER café", "absent_term_xyz", ""]
    for q in queries:
        for fn in (topk_exact, topk_wand):
            got = [(r["doc_id"], r["score"]) for r in fn(idx, q, 10).collect()]
            exp = oracle.topk(q, 10)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, seed)
            for (_, gs), (_, es) in zip(got, exp):
                assert abs(gs - es) < 1e-9, (q, seed)
