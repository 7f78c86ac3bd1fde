"""Same-window A/B harness for build_index + query latency (guide §1).

Times N repeats of: build over sf docs (html path), build over 100k synth,
and per-query latency over the synth index. Prints one JSON line. Run it
back-to-back against two checkouts for an in-window A/B.

Usage: python scripts/bench_build_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from webindex.build import build_index
    from webindex.pagesgen import generate_pages_df, pages_from_documents
    from webindex.query import topk_wand
    from webindex.session import get_spark

    spark = get_spark(app="build-ab", master=f"local[{cpus}]", driver_mem="48g")
    workdir = tempfile.mkdtemp(prefix="webindex_ab_")
    out: dict[str, object] = {}
    try:
        pages = pages_from_documents(spark, sf_dir)
        pages.count()
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            build_index(spark, pages, text_col="html", doc_id_method="hash",
                        out_dir=f"{workdir}/idx_docs")
            ts.append(round(time.monotonic() - t0, 2))
        out["build_docs"] = ts

        generate_pages_df(spark, 100_000).write.mode("overwrite").parquet(
            f"{workdir}/pages_synth")
        synth = spark.read.parquet(f"{workdir}/pages_synth")
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            idx = build_index(spark, synth, text_col="html", doc_id_method="hash",
                              out_dir=f"{workdir}/idx_synth")
            ts.append(round(time.monotonic() - t0, 2))
        out["build_synth100k"] = ts

        topk_wand(idx, "warmup run", 10).collect()
        qlat = {}
        for q in ["the", "the data spark", "w180", "absentterm42"]:
            per = []
            for _ in range(max(3, reps)):
                t0 = time.monotonic()
                topk_wand(idx, q, 10).collect()
                per.append(round(time.monotonic() - t0, 3))
            qlat[q] = per
        out["query"] = qlat
        nfiles = {
            t: sum(1 for _ in Path(f"{workdir}/idx_synth/{t}").rglob("*.parquet"))
            for t in ["postings", "term_stats", "term_grams", "doc_stats"]
        }
        out["files"] = nfiles
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
