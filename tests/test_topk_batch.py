"""Batched query evaluation: topk_batch == per-query topk_exact for every
query, in one job."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_batch, topk_exact

QUERIES = {
    "q_hot": "the",
    "q_multi": "spark index query",
    "q_rare": "w199 merge",
    "q_absent": "zzz_nothere",
    "q_case": "The DATA",
}


def test_batch_equals_per_query(spark):
    pdf = make_pages_pdf(0, 250)
    pdf.insert(0, "doc_id", np.arange(250, dtype=np.int64))
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="html",
        doc_id_method="provided", range_width=64,
    )
    batch = topk_batch(idx, QUERIES, k=10).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid in got:
        got[qid].sort()
    for qid, q in QUERIES.items():
        exp = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(topk_exact(idx, q, 10).collect())
        ]
        assert got.get(qid, []) == exp, qid
    assert "q_absent" not in got
