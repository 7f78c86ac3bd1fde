"""Single-JVM 32-thread contention A/B (round 4).

The concurrent-isolation experiment (bench_concurrency.py) showed 4 separate
8-core JVMs aggregate ~1.65x the throughput of ONE 32-thread JVM on the same
input — the residual local[32] inefficiency is in-process. This harness A/Bs
the plausible in-JVM knobs on the full 300k web-like build, one fresh
subprocess JVM per variant, interleaved vs base so window shifts show up:

  base       current session.py defaults
  parallelgc -XX:+UseParallelGC (throughput collector; G1 is the JVM17
             default and optimizes pauses, not batch throughput)
  bigbuf     1m shuffle file buffers (default 32k; 512 partitions x 32 tasks
             = many tiny buffered writers through one page cache)
  zstd       spark.io.compression.codec=zstd (better ratio -> less IO/membw)

Appends {"mode": "jvm_ab", ...} to BENCH/scaling_runs.jsonl.

Run: python scripts/bench_jvm_ab.py [n_docs=300000] [repeats=2]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "parallelgc": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "bigbuf": {
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
    },
    "zstd": {"spark.io.compression.codec": "zstd"},
}

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from webindex.pagesgen import generate_pages_df, WEBLIKE_TOKENS
from webindex.session import get_spark
spark = get_spark(app="abgen", master="local[32]", shuffle_partitions=64,
                  driver_mem="40g")
generate_pages_df(spark, {n_docs}, partitions=128,
                  tokens_range=WEBLIKE_TOKENS).write.mode("overwrite").parquet({pages!r})
spark.stop()
"""

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from webindex.build import build_index
from webindex.session import get_spark

spark = get_spark(app="ab-{name}", master="local[32]", shuffle_partitions=512,
                  driver_mem="80g", extra={extra!r})
pages = spark.read.parquet({pages!r})
t0 = time.monotonic()
build_index(spark, pages, text_col="html", doc_id_method="hash",
            out_dir={workdir!r} + "/idx")
print("RESULT:" + json.dumps({{"elapsed": time.monotonic() - t0}}), flush=True)
spark.stop()
"""


def _settle() -> None:
    for path, val in (
        ("/proc/sys/vm/drop_caches", "1"),
        ("/proc/sys/vm/compact_memory", "1"),
    ):
        try:
            with open(path, "w") as fh:
                fh.write(val)
        except OSError:
            pass
    time.sleep(10)


def _run(name: str, extra: dict, pages: str, workdir: str) -> float:
    code = _WORKER.format(
        repo=str(REPO), name=name, extra=extra, pages=pages, workdir=workdir
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])["elapsed"]
    raise RuntimeError(f"variant {name} failed:\n{out.stderr[-2000:]}")


def main() -> None:
    from boxmeter import PhaseMeter, wait_clean

    wait_clean_s = 0.0
    argv = []
    for a in sys.argv:
        if a.startswith("--wait-clean"):
            wait_clean_s = float(a.split("=", 1)[1]) if "=" in a else 3600.0
        elif a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
            for v in list(VARIANTS):
                if v not in only:
                    del VARIANTS[v]
        else:
            argv.append(a)
    sys.argv = argv
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    tmp_base = "/dev/shm" if Path("/dev/shm").exists() else None
    times: dict[str, list[float]] = {v: [] for v in VARIANTS}
    cotenant: dict[str, list[float]] = {v: [] for v in VARIANTS}
    steal: dict[str, list[float]] = {v: [] for v in VARIANTS}
    with tempfile.TemporaryDirectory(prefix="jvmab_", dir=tmp_base) as base:
        pages = f"{base}/pages"
        subprocess.run(
            [sys.executable, "-c",
             _GEN.format(repo=str(REPO), n_docs=n_docs, pages=pages)],
            check=True, capture_output=True, text=True, timeout=1200,
        )
        for rep in range(repeats):
            # base re-runs inside EVERY repetition so each variant has a
            # same-window base to compare against
            if wait_clean_s:
                wait_clean(wait_clean_s)
            for name, extra in VARIANTS.items():
                _settle()
                with PhaseMeter() as m:
                    t = _run(name, extra, pages, f"{base}/r{rep}_{name}")
                times[name].append(t)
                cotenant[name].append(round(m.cotenant_cores, 2))
                steal[name].append(round(m.steal_cores, 2))
                print(f"[rep {rep}] {name}: {t:.1f}s "
                      f"(ours {m.our_cores:.1f} / cotenant {m.cotenant_cores:.1f} / steal {m.steal_cores:.1f})", flush=True)

    summary = {
        "mode": "jvm_ab",
        "n_docs": n_docs,
        "repeats": repeats,
        "times_s": {k: [round(x, 1) for x in v] for k, v in times.items()},
        "cotenant_cores": cotenant,
        "steal_cores": steal,
        "min_s": {k: round(min(v), 1) for k, v in times.items()},
        "vs_base": {
            k: round(min(times["base"]) / min(v), 3) for k, v in times.items()
        },
    }
    print(json.dumps(summary), flush=True)
    with open(REPO / "BENCH" / "scaling_runs.jsonl", "a") as fh:
        fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
