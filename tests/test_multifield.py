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


def test_lookup_url_partition_pruned(spark, tmp_path):
    """Disk-backed url lookup (round 4): the url_index projection is
    partitioned by url_bucket, so the probe must (a) show a PartitionFilters
    directory prune in the plan and (b) demonstrably never OPEN files of
    other buckets — proven by corrupting every other bucket's parquet files
    and watching the lookup still succeed where a full scan crashes."""
    import glob
    import io

    from contextlib import redirect_stdout

    from webindex.build import N_URL_BUCKETS, build_index
    from webindex.pagesgen import make_pages_pdf

    out = str(tmp_path / "idx")
    pdf = make_pages_pdf(0, 200)
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="html",
        doc_id_method="hash", out_dir=out,
    )
    assert idx.url_stats is not None
    row = idx.doc_stats.orderBy("doc_id").limit(1).collect()[0]
    url, doc_id = row["url"], row["doc_id"]

    probe = lookup_url(idx, url)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "url_bucket" in plan, plan

    # files-read < total, behaviorally: corrupt EVERY other bucket's files;
    # the pruned lookup never opens them, an unpruned scan blows up
    target_bucket = spark.sql(
        f"SELECT pmod(xxhash64('{url}'), {N_URL_BUCKETS}) AS b"
    ).collect()[0]["b"]
    corrupted = 0
    for d in glob.glob(f"{out}/url_index/url_bucket=*"):
        if d.endswith(f"url_bucket={target_bucket}"):
            continue
        for f in glob.glob(f"{d}/*.parquet"):
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")
            corrupted += 1
    assert corrupted > 0  # 200 urls over 64 buckets: other buckets exist

    got = lookup_url(idx, url).collect()
    assert len(got) == 1 and got[0]["doc_id"] == doc_id
    assert got[0]["doc_len"] > 0

    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(f"{out}/url_index").groupBy().count().collect()


def test_most_fields_matches_oracle_sum(two_field):
    from webindex.query import topk_most_fields

    indexes, (o_text, o_title) = two_field
    for q in ("the data", "doc", "spark merge doc"):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_most_fields(indexes, q, 10).collect()
        ]
        s_text, s_title = o_text.score_all(q), o_title.score_all(q)
        # sum in field-name-ascending order: "text" then "title"
        merged = {
            d: s_text.get(d, 0.0) + s_title.get(d, 0.0)
            for d in set(s_text) | set(s_title)
        }
        exp = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == [(d, round(s, 9)) for d, s in exp], q
    # sum-merge vs max-merge must actually disagree on this fixture (else
    # a silent regression to best_fields would pass), and the engine must
    # land on the sum side
    q = "spark merge doc"
    s_text, s_title = o_text.score_all(q), o_title.score_all(q)
    docs = set(s_text) | set(s_title)
    sum_rank = [
        d for d, _ in sorted(
            ((d, s_text.get(d, 0.0) + s_title.get(d, 0.0)) for d in docs),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
    ]
    max_rank = [
        d for d, _ in sorted(
            ((d, max(s_text.get(d, -1e308), s_title.get(d, -1e308))) for d in docs),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
    ]
    assert sum_rank != max_rank  # fixture sanity: the two semantics differ
    bf = [r["doc_id"] for r in topk_best_fields(indexes, q, 10).collect()]
    mf = [r["doc_id"] for r in topk_most_fields(indexes, q, 10).collect()]
    assert mf == sum_rank and bf == max_rank and mf != bf


def test_cross_fields_blended_term_centric(two_field):
    from webindex.bm25 import DEFAULT
    from webindex.query import topk_cross_fields
    from webindex.textproc import tokenize

    indexes, (o_text, o_title) = two_field
    oracles = {"text": o_text, "title": o_title}
    n = o_text.n_docs
    for q in ("the data", "doc data", "spark merge doc"):
        terms = sorted(set(tokenize(q)))
        want_scores = {}
        for t in terms:
            dfs = [o.df(t) for o in oracles.values() if o.df(t) > 0]
            if not dfs:
                continue
            idf_b = DEFAULT.idf(max(dfs), n)
            contribs = {}
            for f in sorted(oracles):
                o = oracles[f]
                if o.df(t) == 0:
                    continue
                for d, s in o.score_all(t).items():
                    # score_all = idf(t)*impact; rescale to the blended idf
                    c = idf_b * (s / o.idf(t))
                    contribs[d] = max(contribs.get(d, float("-inf")), c)
            for d, c in contribs.items():
                want_scores[d] = want_scores.get(d, 0.0) + c
        want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_cross_fields(indexes, q, 10).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q
