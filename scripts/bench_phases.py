"""Per-phase build timing at one parallelism level — locates WHERE wall-clock
goes (and which phase stops scaling) by running build_index's exact stages
with a timer between them, in a fresh subprocess/JVM per level.

Phases:
  tokenize   pages scan -> extract+tokenize -> runs parquet write (the
             SPIMI map; regex/memory-bandwidth heavy)
  vocab      combined vocab+corpus aggregate over runs (map-side combined)
  encode     (term_hash, bucket) shuffle -> delta+varint block encode ->
             postings parquet write (the one big shuffle)
  finish     term_stats + doc_stats + corpus_stats + conf writes (small
             fixed-latency jobs; pure serial overhead at small scale)

Run: python scripts/bench_phases.py [n_docs] [cores ...]
e.g. python scripts/bench_phases.py 300000 8 32
Appends JSON lines to BENCH/phase_runs.jsonl.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time, tempfile, os
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from webindex.bm25 import DEFAULT
from webindex.build import (
    adaptive_range_width, assign_doc_ids, build_doc_stats, build_postings,
    build_runs, resolve_term_hashes, term_hash_expr, vocab_and_corpus_agg,
    _with_idf,
)
from webindex.pagesgen import generate_pages_df, WEBLIKE_TOKENS
from webindex.session import get_spark

cores, n_docs = {cores}, {n_docs}
spark = get_spark(app=f"phases-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=512, driver_mem="80g")
_tmp_base = "/dev/shm" if os.access("/dev/shm", 2) else None
with tempfile.TemporaryDirectory(prefix=f"ph{{cores}}_", dir=_tmp_base) as wd:
    generate_pages_df(spark, n_docs, partitions=128,
                      tokens_range=WEBLIKE_TOKENS).write.mode("overwrite").parquet(f"{{wd}}/pages")
    pages = spark.read.parquet(f"{{wd}}/pages")
    out = f"{{wd}}/idx"
    t = {{}}

    t0 = time.monotonic()
    pages = assign_doc_ids(pages, "hash")
    runs = build_runs(pages, text_col="html")
    runs.write.mode("overwrite").parquet(f"{{out}}/runs")
    runs = spark.read.parquet(f"{{out}}/runs")
    t["tokenize"] = time.monotonic() - t0

    t0 = time.monotonic()
    vocab_df, handle, n, avgdl = vocab_and_corpus_agg(runs)
    _, remap = resolve_term_hashes(vocab_df)
    t["vocab"] = time.monotonic() - t0

    rw = adaptive_range_width(n)
    t0 = time.monotonic()
    build_postings(
        runs, avgdl, DEFAULT, rw, n_docs=n, id_space="hash", hash_remap=remap
    ).sortWithinPartitions("term_hash", "block_id").write.mode("overwrite").parquet(
        f"{{out}}/postings"
    )
    t["encode"] = time.monotonic() - t0

    t0 = time.monotonic()
    _with_idf(
        vocab_df.withColumn("term_hash", term_hash_expr(F.col("term"), remap)), n
    ).sortWithinPartitions("term").write.mode("overwrite").parquet(f"{{out}}/term_stats")
    build_doc_stats(pages, runs).sortWithinPartitions("doc_id").write.mode(
        "overwrite"
    ).parquet(f"{{out}}/doc_stats")
    handle.unpersist()
    t["finish"] = time.monotonic() - t0
    t["total"] = sum(t.values())
print("RESULT:" + json.dumps(t))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cores_list = [int(c) for c in sys.argv[2:]] or [8, 32]
    rows = []
    for cores in cores_list:
        code = _WORKER.format(repo=str(REPO), cores=cores, n_docs=n_docs)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT:"):
                t = json.loads(line[len("RESULT:"):])
                rows.append({"cores": cores, "n_docs": n_docs, **{k: round(v, 1) for k, v in t.items()}})
                break
        else:
            raise RuntimeError(f"worker {cores} failed:\n{out.stderr[-1500:]}")
    import datetime

    dest = REPO / "BENCH" / "phase_runs.jsonl"
    ts = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%MZ")
    with dest.open("a") as fh:
        for r in rows:
            fh.write(json.dumps({"ts": ts, **r}) + "\n")
    for r in rows:
        print(json.dumps(r))
    if len(rows) == 2:
        a, b = rows
        print("speedup per phase "
              f"({a['cores']}->{b['cores']} cores): "
              + ", ".join(f"{k}: {a[k]/max(b[k],0.1):.2f}x"
                          for k in ("tokenize", "vocab", "encode", "finish", "total")))


if __name__ == "__main__":
    main()
