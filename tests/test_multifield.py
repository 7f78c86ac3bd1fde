"""best_fields (dis_max) multi-field query + point lookups (reference T1/S10)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import lookup_doc, lookup_url, topk_best_fields


@pytest.fixture(scope="module")
def two_field(spark):
    pdf = make_pages_pdf(0, 120)
    pdf.insert(0, "doc_id", np.arange(120, dtype=np.int64))
    # field A = text; field B = url-ish short field (title analogue)
    pdf["title"] = ["doc " + " ".join(t.split()[:3]) for t in pdf["text"]]
    pages = spark.createDataFrame(pdf)
    idx_text = build_index(
        spark, pages, text_col="text", doc_id_method="provided", range_width=64
    )
    idx_title = build_index(
        spark,
        pages.withColumn("text", F.col("title")),
        text_col="text",
        doc_id_method="provided",
        range_width=64,
    )
    o_text = OracleIndex({i: pdf["text"][i] for i in range(120)})
    o_title = OracleIndex({i: pdf["title"][i] for i in range(120)})
    return {"text": idx_text, "title": idx_title}, (o_text, o_title)


def test_best_fields_matches_oracle_dismax(two_field):
    indexes, (o_text, o_title) = two_field
    for q in ("the data", "doc", "spark merge doc"):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_best_fields(indexes, q, 10).collect()
        ]
        s_text, s_title = o_text.score_all(q), o_title.score_all(q)
        merged = {d: max(s_text.get(d, -1), s_title.get(d, -1)) for d in set(s_text) | set(s_title)}
        exp = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-9


def test_point_lookups(two_field):
    indexes, _ = two_field
    idx = indexes["text"]
    row = lookup_doc(idx, 5).collect()
    assert len(row) == 1 and row[0]["doc_id"] == 5
    url = row[0]["url"]
    back = lookup_url(idx, url).collect()
    assert len(back) == 1 and back[0]["doc_id"] == 5
