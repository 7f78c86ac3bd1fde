"""Box-load metering for the scaling harnesses (round 4).

The sandbox host is shared: co-tenant load varies from ~0 to 20+ cores over
hours and has repeatedly poisoned local[32] measurements (a 32-thread job
collapses when 18 foreign cores are busy while a local[8] job barely
notices — which *biases measured scaling efficiency downward*). These
helpers make window quality a recorded per-sample measurement instead of a
narrative:

- PhaseMeter: context manager recording wall time, CPU consumed by OUR
  (reaped) children, and the average number of co-tenant cores busy during
  the phase (/proc/stat total minus our children).
- probe_cotenant(): sample the box for a few seconds with no children of
  ours running -> busy cores right now.
- wait_clean(): poll probe_cotenant() until the box is quiet (or a deadline
  passes), so a harness can HOLD for a clean window instead of burning it
  on a doomed sample.

RUSAGE_CHILDREN is cumulative over reaped descendants, which is exactly the
right accounting here: each phase spawns subprocess JVMs and waits for them,
so by phase end their whole tree's CPU has rolled up.
"""

from __future__ import annotations

import resource
import time


def box_busy_seconds() -> float:
    """Whole-box busy CPU seconds since boot (/proc/stat: everything except
    idle+iowait), all cores summed. USER_HZ assumed 100 (linux default)."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [int(x) for x in f[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return (sum(vals) - idle) / 100.0


def our_child_cpu() -> float:
    """CPU seconds consumed by reaped child processes (worker JVMs + their
    python workers)."""
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    return ru.ru_utime + ru.ru_stime


class PhaseMeter:
    """Records wall, our-children CPU cores, and co-tenant CPU cores
    (everything on the box that is NOT our children, averaged over the
    phase). cotenant_cores < ~1 marks a clean sample."""

    def __enter__(self):
        self.w0 = time.monotonic()
        self.b0 = box_busy_seconds()
        self.c0 = our_child_cpu()
        return self

    def __exit__(self, *exc):
        wall = max(1e-6, time.monotonic() - self.w0)
        ours = our_child_cpu() - self.c0
        box = box_busy_seconds() - self.b0
        self.wall = wall
        self.our_cores = ours / wall
        self.cotenant_cores = max(0.0, (box - ours) / wall)


def probe_cotenant(seconds: float = 6.0) -> float:
    """Busy cores on the box right now, sampled over `seconds`. Call only
    while nothing of ours is running — the caller's own (tiny) CPU is
    included, so expect ~0.0-0.3 on a genuinely idle box."""
    b0, t0 = box_busy_seconds(), time.monotonic()
    time.sleep(seconds)
    return (box_busy_seconds() - b0) / (time.monotonic() - t0)


def wait_clean(
    max_wait_s: float,
    thresh_cores: float = 2.0,
    probe_s: float = 6.0,
    poll_s: float = 30.0,
    log=print,
) -> float | None:
    """Poll until the box has <= thresh_cores busy, up to max_wait_s.
    Returns the clean probe value, or None on timeout (caller proceeds
    anyway — every sample still carries its own PhaseMeter number)."""
    deadline = time.monotonic() + max_wait_s
    while True:
        busy = probe_cotenant(probe_s)
        if busy <= thresh_cores:
            log(f"[boxmeter] window clean ({busy:.1f} busy cores)")
            return busy
        if time.monotonic() >= deadline:
            log(f"[boxmeter] wait-clean timed out ({busy:.1f} busy cores); proceeding metered")
            return None
        log(f"[boxmeter] box busy ({busy:.1f} cores), holding {poll_s:.0f}s")
        time.sleep(poll_s)
