"""Pure-hardware host-capacity probe: what does this box actually deliver
at 8 vs 32 processes, independent of Spark and of the engine?

Two workloads, each run as P isolated worker PROCESSES for a fixed wall
window, aggregate application-level throughput summed from per-worker
counters (not /proc, which counts memory-stall cycles as "busy"):

  spin    tight integer arithmetic on a few registers (cache-resident,
          no memory traffic) -> measures delivered CPU cycles.
  stream  numpy add over a 256 MB float64 working set (far beyond LLC)
          -> measures delivered memory bandwidth.

Interpretation for the N-vs-4N scaling criterion:
  - spin scales ~4x from 8->32 but stream doesn't: the socket's memory
    bandwidth is the shared ceiling — any memory-heavy job on this box
    stops scaling at the stream ratio NO MATTER how it is parallelized
    (one JVM, four JVMs, or four hypothetical executors on one socket);
    separate-socket executors don't share this ceiling.
  - spin itself doesn't scale ~4x: the hypervisor isn't delivering 32
    hardware threads' worth of cycles (cap/oversubscription/SMT) — wall
    clock at 32 threads is bounded below by spin_ratio/4 of ideal even
    for a perfectly parallel job, and /proc "busy" accounting cannot see
    it (a capped vCPU still reports busy).

The ratio (stream 8->32 scaling) is an upper bound on what ANY
shuffle/encode-heavy stage can achieve on this box; compare it to the
build's measured same-window scaling before blaming the engine.

Appends {"mode": "hostcap", ...} to BENCH/scaling_runs.jsonl.

Run: python scripts/bench_hostcap.py [window_s=8] [levels=8,32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SPIN = r"""
import time, sys
start = float(sys.argv[1])          # synchronized wall start (epoch)
while time.time() < start:
    time.sleep(0.005)
t0 = time.monotonic(); deadline = t0 + {window}
ops = 0
x = 1
while time.monotonic() < deadline:
    # 64k-iteration inner block between clock checks
    for _ in range(65536):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    ops += 65536
print(ops / (time.monotonic() - t0))
"""

_STREAM = r"""
import time, sys
import numpy as np
n = 16 * 1024 * 1024  # 128 MB per array, float64 (>> LLC)
a = np.ones(n); b = np.ones(n); c = np.zeros(n)  # pre-touched pages
start = float(sys.argv[1])
while time.time() < start:
    time.sleep(0.005)
t0 = time.monotonic(); deadline = t0 + {window}
moved = 0
while time.monotonic() < deadline:
    np.add(a, b, out=c)      # reads 2 arrays, writes 1: 3 * 128 MB
    moved += 3 * n * 8
print(moved / (time.monotonic() - t0))
"""


def _run_level(code_tmpl: str, nprocs: int, window_s: float) -> float:
    """Aggregate self-timed rate across nprocs python workers. Workers
    allocate/warm up first, then all start at one synchronized wall instant
    and each reports its own measured rate — startup and allocation never
    pollute the window, and overlap is guaranteed by construction."""
    code = code_tmpl.replace("{window}", str(window_s))
    start = str(time.time() + 3.0)  # 3 s for interpreter start + alloc
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, start], stdout=subprocess.PIPE
        )
        for _ in range(nprocs)
    ]
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += float(out.split()[-1])
    return total


def main() -> None:
    window_s = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    levels = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [8, 32]
    )
    sys.path.insert(0, str(REPO / "scripts"))
    from boxmeter import probe_cotenant

    res: dict[str, dict[int, float]] = {"spin": {}, "stream": {}}
    pre_busy = round(probe_cotenant(3), 2)
    # interleave levels within each workload so a window shift mid-probe
    # shows up as an inconsistent pair rather than silently biasing one level
    for name, tmpl in (("spin", _SPIN), ("stream", _STREAM)):
        for np_ in levels:
            res[name][np_] = _run_level(tmpl, np_, window_s)
            time.sleep(1.0)
    lo, hi = levels[0], levels[-1]
    ideal = hi / lo
    out = {
        "mode": "hostcap",
        "ts": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
        "window_s": window_s,
        "pre_busy_cores": pre_busy,
        "levels": levels,
        "spin_ops_s": {str(k): round(v) for k, v in res["spin"].items()},
        "stream_bytes_s": {str(k): round(v) for k, v in res["stream"].items()},
        "spin_scaling": round(res["spin"][hi] / res["spin"][lo], 3),
        "stream_scaling": round(res["stream"][hi] / res["stream"][lo], 3),
        "ideal_scaling": ideal,
        "spin_eff": round(res["spin"][hi] / res["spin"][lo] / ideal, 3),
        "stream_eff": round(res["stream"][hi] / res["stream"][lo] / ideal, 3),
        "stream_gb_s": {str(k): round(v / 1e9, 2) for k, v in res["stream"].items()},
    }
    print(json.dumps(out))
    with (REPO / "BENCH" / "scaling_runs.jsonl").open("a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
