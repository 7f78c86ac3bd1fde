"""Measure the build's total shuffle volume + wall time via Spark's REST
status API (shuffle write bytes summed over all stages of the build jobs).

Used to quantify the term-hash shuffle-key change (posting shuffle rows carry
an 8-byte xxhash64 instead of the term string). Run against any repo root:

    python scripts/bench_shuffle.py [repo_root] [n_docs]

Prints one JSON line: {"repo": ..., "n_docs": N, "build_s": ...,
"shuffle_write_bytes": ..., "shuffle_read_bytes": ...}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else "."
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    sys.path.insert(0, repo)

    from webindex.build import build_index
    from webindex.pagesgen import WEBLIKE_TOKENS, generate_pages_df
    from webindex.session import get_spark

    spark = get_spark(
        app="shuffle-bench",
        master="local[32]",
        shuffle_partitions=64,
        extra={"spark.ui.enabled": "true"},  # REST status API is the meter
    )
    _tmp = "/dev/shm" if __import__("os").access("/dev/shm", 2) else None
    with tempfile.TemporaryDirectory(prefix="shufbench_", dir=_tmp) as wd:
        generate_pages_df(
            spark, n_docs, partitions=64, tokens_range=WEBLIKE_TOKENS
        ).write.mode("overwrite").parquet(f"{wd}/pages")
        pages = spark.read.parquet(f"{wd}/pages")
        t0 = time.monotonic()
        build_index(spark, pages, text_col="html", doc_id_method="hash",
                    out_dir=f"{wd}/idx")
        build_s = time.monotonic() - t0

        app_id = spark.sparkContext.applicationId
        base = spark.sparkContext.uiWebUrl
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
        print(json.dumps({
            "repo": repo,
            "n_docs": n_docs,
            "build_s": round(build_s, 2),
            "shuffle_write_bytes": sw,
            "shuffle_read_bytes": sr,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
