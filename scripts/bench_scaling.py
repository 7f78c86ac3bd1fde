"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver instruction the
N-vs-4N-executor criterion is evidenced by running the identical index build
at local[8] and local[32] on the same input and reporting throughput at both
plus scaling efficiency = (T_8 / T_32) / 4, and rank-identity of the top-k
results across the two runs.

Each parallelism level runs in a FRESH subprocess (one JVM per "cluster" —
sequential sessions in one process contaminate each other: measured 3x
slow-down for the second session from leftover python workers/GC).

Appends the raw result to BENCH/scaling_runs.jsonl and writes a generated
summary to BENCH/SCALING_LATEST.md. BENCH/BASELINE.md is the hand-curated
record (it carries the host-variance analysis) — update it from these
artifacts, never overwrite it mechanically.

Run: python scripts/bench_scaling.py [n_docs] [repeats]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

QUERIES = ["the", "data spark", "w199 merge", "index query search", "the w150"]

_WORKER = r"""
import json, sys, time, tempfile
sys.path.insert(0, {repo!r})
from webindex.build import build_index
from webindex.pagesgen import generate_pages_df
from webindex.query import topk_wand
from webindex.session import get_spark

cores, n_docs, queries = {cores}, {n_docs}, {queries!r}
# SAME shuffle partitioning + heap at both levels: identical physical plan
# and memory budget, only the core count differs (the honest N-vs-4N setup).
# 80g heap: at 40g the reduce stage was GC-bound (python workers starved at
# 15% while the JVM burned 13 cores; 3.2x slower end-to-end).
spark = get_spark(app=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=512, driver_mem="80g")
_tmp_base = "/dev/shm" if __import__("os").access("/dev/shm", 2) else None
with tempfile.TemporaryDirectory(prefix=f"scale{{cores}}_", dir=_tmp_base) as wd:
    # corpus materialized untimed — we measure the index build. WEBLIKE doc
    # sizes (200-2000 tokens, Common-Crawl-ish) so per-doc extract+tokenize
    # CPU dominates, as it does at 100 TB.
    from webindex.pagesgen import WEBLIKE_TOKENS
    generate_pages_df(spark, n_docs, partitions=128,
                      tokens_range=WEBLIKE_TOKENS).write.mode("overwrite").parquet(f"{{wd}}/pages")
    pages = spark.read.parquet(f"{{wd}}/pages")
    t0 = time.monotonic()
    idx = build_index(spark, pages, text_col="html", doc_id_method="hash", out_dir=f"{{wd}}/idx")
    elapsed = time.monotonic() - t0
    hits = {{q: [(r["doc_id"], round(r["score"], 9)) for r in topk_wand(idx, q, 10).collect()]
            for q in queries}}
print("RESULT:" + json.dumps({{"elapsed": elapsed, "hits": hits}}))
spark.stop()
"""


def run_at(cores: int, n_docs: int):
    code = _WORKER.format(repo=str(REPO), cores=cores, n_docs=n_docs, queries=QUERIES)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT:"):
            data = json.loads(line[len("RESULT:"):])
            return data["elapsed"], data["hits"]
    raise RuntimeError(f"worker at {cores} cores failed:\n{out.stderr[-2000:]}")


def _settle_memory() -> None:
    """Between runs: drop page cache + compact memory, then pause. A fresh
    JVM started right after a heavy one runs up to 4x slower here (kernel
    page-cache reclaim + compaction storms — observed 96% sys time); each
    'cluster size' deserves the same clean-machine start."""
    import time

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


def main() -> None:
    # --wait-clean[=secs]: before each leg, poll the box until co-tenant
    # load is <= 2 cores (boxmeter); on timeout proceed anyway — every
    # sample records its own cotenant number either way.
    # --clean-pairs[=secs]: stronger — ALSO re-run any leg whose measured
    # cotenant load exceeded CLEAN_CORES (the tenant here oscillates on a
    # minutes timescale, so a pre-run probe alone can't guarantee a clean
    # sample; the post-run meter can certify one). A pair whose two legs
    # each measured clean is valid same-conditions evidence regardless of
    # when each leg ran — the meter, not adjacency, establishes
    # comparability. All attempts (dirty included) are recorded.
    wait_clean_s = 0.0
    clean_pairs = False
    argv = []
    for a in sys.argv:
        if a.startswith("--clean-pairs"):
            clean_pairs = True
            wait_clean_s = float(a.split("=", 1)[1]) if "=" in a else 3600.0
        elif a.startswith("--wait-clean"):
            wait_clean_s = float(a.split("=", 1)[1]) if "=" in a else 3600.0
        else:
            argv.append(a)
    sys.argv = argv
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # optional custom N / 4N core pair, e.g. `... 300000 2 4 16`: a pair
    # below the host's physical core count leaves headroom for the kernel +
    # resident background load, isolating the job's scaling from the
    # saturate-every-core artifact of local mode (see Caveat in the output).
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    assert n_big == 4 * n_small, "the criterion is N vs 4N"

    # The sandbox host is a shared VM whose throughput varies several-fold
    # over time (the same local[32] build measured 44s..266s across a day).
    # Methodology: interleave repeated runs of both levels and take the MIN
    # per level — min wall-clock is the standard noise-robust estimator for
    # "what the job costs when the machine is actually available".
    from boxmeter import PhaseMeter, wait_clean

    CLEAN_CORES = 1.5  # a leg measuring above this is not a clean sample
    STEAL_CORES = 2.0  # hypervisor steal above this also disqualifies a leg
    MAX_TRIES = 5  # per leg per repetition, in --clean-pairs mode

    times: dict[int, list[float]] = {n_small: [], n_big: []}
    cotenant: dict[int, list[float]] = {n_small: [], n_big: []}
    steal: dict[int, list[float]] = {n_small: [], n_big: []}
    cap_spin: dict[int, list[float]] = {n_small: [], n_big: []}
    cap_stream: dict[int, list[float]] = {n_small: [], n_big: []}
    hits_at: dict[int, object] = {n_small: None, n_big: None}

    # Round-4 lesson (BENCH/BASELINE.md): this host's capacity oscillates
    # several-fold in ways the co-tenant/steal meter CANNOT see (hypervisor
    # capping shows as busy-but-unproductive cores, zero cotenant, <1 core
    # steal). A pair is only same-conditions evidence if both legs ran at
    # comparable RAW capacity, so each leg records an engine-free capacity
    # probe (32-proc spin + stream, ~10 s) taken immediately before it, and
    # the pairing step prefers the capacity-MATCHED best pair.
    from bench_hostcap import _SPIN, _STREAM, _run_level

    def probe_capacity() -> tuple[float, float]:
        return (
            _run_level(_SPIN, n_big, 3.0),
            _run_level(_STREAM, n_big, 3.0),
        )

    def _is_clean(cot: float, stl: float) -> bool:
        return cot <= CLEAN_CORES and stl <= STEAL_CORES

    def leg(cores: int) -> None:
        for attempt in range(MAX_TRIES):
            if wait_clean_s:
                wait_clean(wait_clean_s, thresh_cores=CLEAN_CORES)
            _settle_memory()
            spin_c, stream_c = probe_capacity()
            with PhaseMeter() as m:
                t, hits = run_at(cores, n_docs)
            times[cores].append(t)
            cap_spin[cores].append(round(spin_c))
            cap_stream[cores].append(round(stream_c))
            cotenant[cores].append(round(m.cotenant_cores, 2))
            steal[cores].append(round(m.steal_cores, 2))
            hits_at[cores] = hits
            clean = _is_clean(m.cotenant_cores, m.steal_cores)
            print(
                f"  local[{cores}]: {t:.1f}s (ours {m.our_cores:.1f} / cotenant "
                f"{m.cotenant_cores:.1f} / steal {m.steal_cores:.1f} cores"
                f"{'' if clean else ' — DIRTY'})", flush=True,
            )
            if clean or not clean_pairs:
                return
        print(f"  local[{cores}]: giving up after {MAX_TRIES} dirty attempts",
              flush=True)

    for _ in range(repeats):
        leg(n_small)
        leg(n_big)
    hits8, hits32 = hits_at[n_small], hits_at[n_big]
    # prefer the best CLEAN leg per level; fall back to overall min
    clean8 = [t for t, c, s in zip(times[n_small], cotenant[n_small], steal[n_small])
              if _is_clean(c, s)]
    clean32 = [t for t, c, s in zip(times[n_big], cotenant[n_big], steal[n_big])
               if _is_clean(c, s)]
    t8 = min(clean8) if clean8 else min(times[n_small])
    t32 = min(clean32) if clean32 else min(times[n_big])
    print(f"samples: local[{n_small}]={[round(x,1) for x in times[n_small]]} "
          f"local[{n_big}]={[round(x,1) for x in times[n_big]]}")

    eff = (t8 / t32) / 4.0
    identical = hits8 == hits32
    thr8, thr32 = n_docs / t8, n_docs / t32

    # capacity-matched pairing: among CLEAN legs, the (i, j) pair whose
    # capacity probes agree best (log-distance over spin and stream); its
    # efficiency is reported alongside the min-based one. None when either
    # level has no clean sample.
    import math

    def _clean_idx(cores: int) -> list[int]:
        return [
            i
            for i, (c, s) in enumerate(zip(cotenant[cores], steal[cores]))
            if _is_clean(c, s)
        ]

    capmatch = None
    ci8, ci32 = _clean_idx(n_small), _clean_idx(n_big)
    if ci8 and ci32:
        best = min(
            ((i, j) for i in ci8 for j in ci32),
            key=lambda ij: abs(
                math.log(cap_spin[n_small][ij[0]] / cap_spin[n_big][ij[1]])
            )
            + abs(
                math.log(cap_stream[n_small][ij[0]] / cap_stream[n_big][ij[1]])
            ),
        )
        i, j = best
        spin_ratio = cap_spin[n_small][i] / cap_spin[n_big][j]
        stream_ratio = cap_stream[n_small][i] / cap_stream[n_big][j]
        capmatch = {
            "t8": round(times[n_small][i], 2),
            "t32": round(times[n_big][j], 2),
            "eff": round((times[n_small][i] / times[n_big][j]) / 4.0, 4),
            "spin_ratio": round(spin_ratio, 3),
            "stream_ratio": round(stream_ratio, 3),
            "matched": bool(
                0.8 <= spin_ratio <= 1.25 and 0.8 <= stream_ratio <= 1.25
            ),
        }

    import datetime

    raw = {
        "ts": datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%MZ"),
        "n_docs": n_docs,
        "cores": [n_small, n_big],
        "samples8": [round(x, 1) for x in times[n_small]],
        "samples32": [round(x, 1) for x in times[n_big]],
        "cotenant8": cotenant[n_small],
        "cotenant32": cotenant[n_big],
        "steal8": steal[n_small],
        "steal32": steal[n_big],
        "clean_pair": bool(clean8 and clean32),
        "cap_spin8": cap_spin[n_small],
        "cap_spin32": cap_spin[n_big],
        "cap_stream8": cap_stream[n_small],
        "cap_stream32": cap_stream[n_big],
        "t8": round(t8, 2),
        "t32": round(t32, 2),
        "eff": round(eff, 4),
        "eff_capmatched": capmatch,
        "rank_identical": identical,
    }
    runs = Path(REPO / "BENCH" / "scaling_runs.jsonl")
    runs.parent.mkdir(exist_ok=True)
    with runs.open("a") as fh:
        fh.write(json.dumps(raw) + "\n")

    out = Path(REPO / "BENCH" / "SCALING_LATEST.md")
    out.write_text(f"""# BENCH/SCALING_LATEST — two-parallelism scaling evidence (generated)

Per the driver instruction, the north rule's "N vs 4N executors, scaling
efficiency >= 0.8, rank-identical top-k" criterion is evidenced in-sandbox by
running the identical index build job at local[{n_small}] (N) and
local[{n_big}] (4N) on the same deterministic input, one fresh JVM per level.

- input: synthetic `pages` corpus, n_docs = {n_docs:,} (pagesgen, seed=42,
  Zipf vocabulary -> hot-term skew present; web-like 200-2000 tokens/doc),
  materialized to parquet untimed
- job: build_index(text_col='html') — extraction + tokenize + SPIMI runs +
  (term, doc-range-bucket) shuffle + delta+varint block encode + parquet write
- host: 32 cores, single JVM per run (local mode), PySpark 4.1.2.
  The shared-VM host's throughput varies several-fold over hours, so each
  level is run {repeats}x interleaved and the MIN wall-clock is reported
  (noise-robust); identical shuffle partitioning + heap at both levels.

| parallelism | wall-clock (s) | throughput (docs/s) |
|---|---|---|
| local[{n_small}]  (N)  | {t8:.1f} | {thr8:,.0f} |
| local[{n_big}] (4N) | {t32:.1f} | {thr32:,.0f} |

**Scaling efficiency** = (T_{n_small} / T_{n_big}) / 4 = **{eff:.3f}**
(target >= 0.8 per BASELINE.json; 1.0 = perfect linear scaling)

**Rank-identity across parallelism levels:** {"IDENTICAL" if identical else "MISMATCH"}
— top-10 doc_ids AND BM25 scores for {len(QUERIES)} reference queries
({", ".join(repr(q) for q in QUERIES)}) are byte-equal between the two
levels' indexes (deterministic doc ids + range-bucketed blocks +
fixed-order float summation).

Caveat: local mode shares one host's memory bandwidth, page cache and shuffle
disk across "executors", so local[8]->local[32] understates true multi-node
scaling; the job has no single-reducer stage (the (term,bucket) salt bounds
every task) and no driver-side loops, which is what the criterion tests.

Raw: {json.dumps({"t8": round(t8, 2), "t32": round(t32, 2), "eff": round(eff, 4), "rank_identical": identical})}
""")
    print(out.read_text())


if __name__ == "__main__":
    main()
