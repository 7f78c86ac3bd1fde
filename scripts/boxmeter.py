"""Box-load metering for the scaling harnesses (round 4).

The sandbox host is shared: co-tenant load varies from ~0 to 20+ cores over
hours and has repeatedly poisoned local[32] measurements (a 32-thread job
collapses when 18 foreign cores are busy while a local[8] job barely
notices — which *biases measured scaling efficiency downward*). These
helpers make window quality a recorded per-sample measurement instead of a
narrative:

- PhaseMeter: context manager recording wall time, CPU consumed by OUR
  process subtree, the average number of co-tenant cores busy during the
  phase, and hypervisor steal cores.
- probe_cotenant(): sample the box for a few seconds with no children of
  ours running -> busy cores right now.
- wait_clean(): poll probe_cotenant() until the box is quiet (or a deadline
  passes), so a harness can HOLD for a clean window instead of burning it
  on a doomed sample.

Attribution is by LIVE /proc sampling of our own process subtree, NOT
RUSAGE_CHILDREN: py4j launches the worker JVM with Popen and never wait()s
it, so the JVM (which burns most of the CPU) never rolls up into the reaped
rusage — round-4 diagnosis showed the old meter attributing ~100% of our own
JVM/pyspark-worker CPU to "co-tenant". A 1 s sampler thread walks /proc,
keeps the max cumulative (utime+stime) ever observed per descendant pid,
and sums those at phase end. Processes that die between samples leak at most
(interval x their core use) to the co-tenant figure; pyspark reuses its
python workers via a long-lived daemon, so the leak is small.

Steal (/proc/stat field 8) is hypervisor time taken FROM this VM — neither
ours nor a co-tenant process, but it degrades runs the same way; it is
recorded separately and excluded from both figures.
"""

from __future__ import annotations

import os
import threading
import time


def _stat_fields() -> list[int]:
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:]]


def box_cpu_seconds() -> tuple[float, float]:
    """(busy, steal) CPU seconds since boot, all cores summed. busy =
    everything except idle+iowait+steal. USER_HZ assumed 100."""
    vals = _stat_fields()
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return (sum(vals) - idle - steal) / 100.0, steal / 100.0


def box_busy_seconds() -> float:
    """Whole-box busy CPU seconds since boot (excludes idle+iowait+steal)."""
    return box_cpu_seconds()[0]


def _subtree_cpu_by_pid(root: int, members: set[int]) -> dict[int, float]:
    """{pid: cumulative utime+stime seconds} for root and every live
    descendant, by one /proc walk (ppid chains from /proc/<pid>/stat).

    `members` is the caller's STICKY membership set (mutated in place): a pid
    observed in the subtree once stays attributed even after its parent dies
    and init adopts it (ppid flips to 1, breaking the chain — exactly what
    happens to the py4j JVM at teardown). Pid-reuse over a phase's minutes is
    negligible."""
    procs: dict[int, tuple[int, float]] = {}  # pid -> (ppid, cpu)
    for name in os.listdir("/proc"):
        if not name.isdigit():
            continue
        try:
            with open(f"/proc/{name}/stat", "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        # comm can contain spaces/parens: fields start after the last ')'
        rest = raw[raw.rfind(b")") + 2 :].split()
        # rest[1]=ppid (field 4), rest[11]=utime (14), rest[12]=stime (15)
        procs[int(name)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / 100.0)
    members.add(root)
    # ppids always point "up"; a few passes close the transitive set even if
    # the walk raced a fork (tree depth here is <= 5)
    for _ in range(6):
        grew = False
        for pid, (ppid, _) in procs.items():
            if ppid in members and pid not in members:
                members.add(pid)
                grew = True
        if not grew:
            break
    return {pid: procs[pid][1] for pid in members if pid in procs}


class PhaseMeter:
    """Records wall, our-subtree CPU cores, co-tenant CPU cores (box busy
    minus our live-sampled subtree, averaged over the phase), and steal
    cores. cotenant_cores < ~1 marks a clean sample."""

    def __init__(self, sample_s: float = 1.0):
        self.sample_s = sample_s
        self._max_cpu: dict[int, float] = {}
        self._members: set[int] = set()
        self._stop = threading.Event()

    def _sample(self) -> None:
        for pid, cpu in _subtree_cpu_by_pid(os.getpid(), self._members).items():
            if cpu > self._max_cpu.get(pid, -1.0):
                self._max_cpu[pid] = cpu
        # dead pids keep their last-seen max: CPU stays attributed to us

    def _loop(self) -> None:
        while not self._stop.wait(self.sample_s):
            self._sample()

    def __enter__(self):
        self.w0 = time.monotonic()
        self.b0, self.s0 = box_cpu_seconds()
        self._sample()
        self._base = dict(self._max_cpu)  # subtree CPU burned BEFORE the phase
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5.0)
        self._sample()
        wall = max(1e-6, time.monotonic() - self.w0)
        b1, s1 = box_cpu_seconds()
        ours = sum(
            cpu - self._base.get(pid, 0.0) for pid, cpu in self._max_cpu.items()
        )
        self.wall = wall
        self.our_cores = ours / wall
        self.steal_cores = (s1 - self.s0) / wall
        self.cotenant_cores = max(0.0, (b1 - self.b0 - ours) / wall)


def probe_cotenant(seconds: float = 6.0) -> float:
    """Busy cores on the box right now, sampled over `seconds`. Call only
    while nothing of ours is running — the caller's own (tiny) CPU is
    included, so expect ~0.0-0.3 on a genuinely idle box."""
    b0, t0 = box_busy_seconds(), time.monotonic()
    time.sleep(seconds)
    return (box_busy_seconds() - b0) / (time.monotonic() - t0)


def probe_steal(burn_cores: int = 8, seconds: float = 3.0) -> float:
    """Hypervisor steal cores under LOAD. Steal is invisible on an idle VM
    (the hypervisor only denies CPU that is demanded), so an idle
    probe_cotenant() happily certifies a window in which an actual run will
    lose 3+ cores to steal — observed round 4: idle probe 0.0-0.2 busy, then
    steal 3.3 cores for the whole following leg. This probe spins
    `burn_cores` child processes for `seconds` and returns the measured
    steal rate during the burn."""
    import subprocess
    import sys

    spin = f"import time\nt=time.monotonic()\nwhile time.monotonic()-t<{seconds}: pass\n"
    _, s0 = box_cpu_seconds()
    t0 = time.monotonic()
    procs = [
        subprocess.Popen([sys.executable, "-c", spin]) for _ in range(burn_cores)
    ]
    for p in procs:
        p.wait()
    _, s1 = box_cpu_seconds()
    return (s1 - s0) / max(1e-6, time.monotonic() - t0)


def wait_clean(
    max_wait_s: float,
    thresh_cores: float = 2.0,
    probe_s: float = 6.0,
    poll_s: float = 30.0,
    steal_thresh_cores: float | None = 2.0,
    log=print,
) -> float | None:
    """Poll until the box has <= thresh_cores busy, up to max_wait_s.
    When steal_thresh_cores is set, a passing idle probe is followed by a
    probe_steal() burn — the window is clean only if the box is both idle
    AND actually deliverable. Returns the clean probe value, or None on
    timeout (caller proceeds anyway — every sample still carries its own
    PhaseMeter number)."""
    deadline = time.monotonic() + max_wait_s
    while True:
        busy = probe_cotenant(probe_s)
        if busy <= thresh_cores:
            if steal_thresh_cores is not None:
                stl = probe_steal()
                if stl > steal_thresh_cores:
                    if time.monotonic() >= deadline:
                        log(f"[boxmeter] wait-clean timed out (steal {stl:.1f} cores); proceeding metered")
                        return None
                    log(f"[boxmeter] box idle but steal {stl:.1f} cores, holding {poll_s:.0f}s")
                    time.sleep(poll_s)
                    continue
                log(f"[boxmeter] window clean ({busy:.1f} busy, steal {stl:.1f} cores)")
                return busy
            log(f"[boxmeter] window clean ({busy:.1f} busy cores)")
            return busy
        if time.monotonic() >= deadline:
            log(f"[boxmeter] wait-clean timed out ({busy:.1f} busy cores); proceeding metered")
            return None
        log(f"[boxmeter] box busy ({busy:.1f} cores), holding {poll_s:.0f}s")
        time.sleep(poll_s)
