"""Dump .explain('formatted') for the round-6-touched query paths into
plans/r06/<name>_<tag>.txt (tag = before|after). Run once per checkout:
    python scripts/dump_plans_r06.py after
"""

from __future__ import annotations

import contextlib
import io
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

tag = sys.argv[1]
outdir = REPO / "plans" / "r06"
outdir.mkdir(parents=True, exist_ok=True)

from pyspark.sql import functions as F

from webindex.session import get_spark
from webindex.build import (assign_doc_ids, build_runs, vocab_and_corpus_agg,
                            build_postings, adaptive_range_width, build_index)
from webindex.bm25 import DEFAULT
from webindex.dedup import minhash_signatures, lsh_candidate_pairs
from webindex.pagesgen import generate_pages_df
from webindex.query import topk_wand

spark = get_spark(app="plans-r06", master="local[8]")
wd = tempfile.mkdtemp(prefix="plans_")
generate_pages_df(spark, 5000).write.mode("overwrite").parquet(f"{wd}/pages")
pages = assign_doc_ids(spark.read.parquet(f"{wd}/pages"), "hash")


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
    print("wrote", name, tag)


# 1. posting-block encode plan (build's dominant stage)
runs = build_runs(pages, text_col="html")
runs.write.mode("overwrite").parquet(f"{wd}/runs")
runs_d = spark.read.parquet(f"{wd}/runs")
vocab_df, vh, n_docs, avgdl = vocab_and_corpus_agg(runs_d)
post = build_postings(runs_d, avgdl, DEFAULT, adaptive_range_width(n_docs),
                      n_docs=n_docs, id_space="hash")
dump("build_postings", post)
vh.unpersist()

# 2. WAND top-k scoring plan over a committed index
idx = build_index(spark, pages, text_col="html", doc_id_method="hash",
                  out_dir=f"{wd}/idx")
dump("topk_wand", topk_wand(idx, "the data merge", 10))

# 3. term_stats dictionary lookup (the per-query stats job)
dump("term_lookup", idx.term_stats.filter(F.col("term").isin(["the", "data"])))

# 4. LSH candidate pairs
docs = spark.createDataFrame(
    [(i, f"common tokens here doc {i % 7} tail {i}") for i in range(200)],
    "doc_id long, text string",
)
dump("lsh_pairs", lsh_candidate_pairs(minhash_signatures(docs, n_hashes=16), n_bands=4))

import shutil
shutil.rmtree(wd, ignore_errors=True)
spark.stop()
