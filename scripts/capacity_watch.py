"""Watch for host-capacity recovery and fire the round-4 re-measurements.

The round-4 campaign ran on a day this box delivered ~4x less than its
round-2/3 capacity even in certified-clean (no co-tenant, low-steal)
windows — an absolute hypervisor/host ceiling the steal gate cannot see.
This watcher probes raw capacity with the engine-free hostcap probe
(~40 s) every PERIOD seconds; if delivered 32-proc arithmetic or memory
bandwidth rises well above today's measured band (spin 117-129 M ops/s,
stream 110-133 GB/s), it fires ONE bench.py + one N-vs-4N scaling pair in
the recovered window and exits.

Run: nohup python scripts/capacity_watch.py >> BENCH/capacity_watch.log 2>&1 &
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PERIOD_S = 900
# today's band tops out at spin 129e6 / stream 133e9; require a clear jump
SPIN32_TRIGGER = 1.9e8
STREAM32_TRIGGER = 1.9e11
MAX_HOURS = 5.0


def probe() -> dict | None:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "bench_hostcap.py")],
        capture_output=True, text=True, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"mode": "hostcap"'):
            return json.loads(line)
    return None


def main() -> None:
    t0 = time.time()
    while time.time() - t0 < MAX_HOURS * 3600:
        r = probe()
        if r:
            spin32 = float(r["spin_ops_s"].get("32", 0))
            stream32 = float(r["stream_bytes_s"].get("32", 0))
            print(
                f"[watch] {time.strftime('%H:%M:%S')} spin32={spin32/1e6:.0f}M "
                f"stream32={stream32/1e9:.0f}GB/s", flush=True,
            )
            if spin32 > SPIN32_TRIGGER or stream32 > STREAM32_TRIGGER:
                print("[watch] capacity recovered — firing bench + scaling", flush=True)
                with open(REPO / "BENCH" / "recovered_bench.log", "w") as f:
                    subprocess.run(
                        [sys.executable, str(REPO / "bench.py")],
                        stdout=f, stderr=subprocess.STDOUT, timeout=3600,
                    )
                with open(REPO / "BENCH" / "recovered_scaling.log", "w") as f:
                    subprocess.run(
                        [
                            sys.executable,
                            str(REPO / "scripts" / "bench_scaling.py"),
                            "300000", "2", "--clean-pairs=900",
                        ],
                        stdout=f, stderr=subprocess.STDOUT, timeout=7200,
                    )
                print("[watch] done — results in BENCH/recovered_*.log", flush=True)
                return
        time.sleep(PERIOD_S)
    print("[watch] gave up: no recovery within the window", flush=True)


if __name__ == "__main__":
    main()
