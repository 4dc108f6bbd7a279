"""External-contention measurement for bench runs on a shared host.

``loadavg`` cannot distinguish a bench job's OWN load from noisy neighbors
(a 32-core job legitimately drives loadavg to ~32). This module measures it
directly: machine-wide busy CPU seconds (/proc/stat) minus the CPU seconds
consumed by THIS process's subtree (the Spark JVM + python workers), over a
wall-clock window. The difference, divided by the window, is the average
number of cores consumed by everyone else — the quantity a load gate must
test.

Two failure modes are handled explicitly:

- Dead descendants: Spark recycles python UDF workers mid-run, and
  ``pyspark/daemon.py`` sets ``SIGCHLD`` to ``SIG_IGN`` — so dead workers
  are auto-reaped by the kernel and POSIX **discards** their CPU times
  (they never accumulate into the daemon's cutime/cstime). A two-snapshot
  delta of the alive subtree therefore loses the entire lifetime CPU of
  every worker that dies inside the window (observed live: six workers x
  ~250 s died in one 5 s span; own_cores read -1479 for that sample and
  ~17 "external" cores for the full-run window). The meter instead POLLS
  the subtree every ``POLL_S`` seconds and accumulates per-PID
  utime+stime increments while processes are alive: a dying worker loses
  at most one poll interval of one core. cutime/cstime are deliberately
  EXCLUDED from the polled sum — a properly-``wait()``ed child would
  otherwise be counted twice (polled alive, then again via the parent's
  cutime at death).

- Hypervisor steal: /proc/stat's steal field is time the HOST ran someone
  else while this guest wanted the core. It is busy-from-the-guest's-view and
  belongs in "external contention" (it is exactly a noisy neighbor, one the
  guest cannot see as a process). It is reported separately too, because a
  level whose samples are steal-bound needs a different retry story than one
  racing a local process.

- Orphan-reaped workers: pyspark worker processes can outlive their daemon
  (double-fork / daemon restart), get REPARENTED TO PID 1, and die there —
  their whole lifetime CPU lands in init's cutime/cstime, invisible to the
  subtree walk. Measured on this sandbox: during one 4M-payload run ~17
  cores of the job's own worker CPU were misattributed as "external" this
  way (own_cores even went negative). Fix: the delta of PID 1's reaped-child
  time inside the window is counted as OWN. Asymmetry: an unrelated process
  dying inside the window is then also credited to the job, UNDER-reading
  external — so the meter additionally reports ``outside_pinned_cores``,
  busy time on cores outside the job's taskset range, which no accounting
  confusion can touch: with the job pinned to cores [0, N), any busy core
  >= N is a real neighbor (for N = all cores the signal is empty).
"""

from __future__ import annotations

import os

_HZ = os.sysconf("SC_CLK_TCK")


def _stat_fields() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def machine_busy_seconds() -> float:
    """Cumulative busy (non-idle, non-iowait) CPU seconds across all cores.

    Includes steal: a stolen tick is a core this guest did not get — busy
    from the measuring job's point of view.
    """
    v = _stat_fields()
    return (sum(v) - v[3] - v[4]) / _HZ


def steal_seconds() -> float:
    """Cumulative hypervisor-steal seconds across all cores."""
    v = _stat_fields()
    return (v[7] if len(v) > 7 else 0) / _HZ


def init_reaped_seconds() -> float:
    """Cumulative CPU seconds PID 1 has reaped from dead (orphaned) children.

    On this sandbox pyspark workers die reparented to init; their lifetime
    CPU is visible nowhere else (see module docstring)."""
    try:
        with open("/proc/1/stat") as f:
            rest = f.read().rsplit(")", 1)[1].split()
        return (int(rest[13]) + int(rest[14])) / _HZ
    except (OSError, IndexError, ValueError):
        return 0.0


def percpu_busy_seconds() -> dict[int, float]:
    """Per-core cumulative busy (non-idle, non-iowait) seconds."""
    out: dict[int, float] = {}
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and line[3:4].isdigit():
                parts = line.split()
                v = list(map(int, parts[1:]))
                out[int(parts[0][3:])] = (sum(v) - v[3] - v[4]) / _HZ
    return out


def subtree_own_ticks(root_pid: int | None = None) -> dict[int, int]:
    """Per-PID utime+stime ticks for root_pid and its alive descendants.

    cutime/cstime deliberately excluded — the polling accumulator in
    ``ExternalLoadMeter`` counts children while they are alive; adding
    reaped-child times on top would double-count properly-waited children
    (see module docstring)."""
    root = root_pid if root_pid is not None else os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
            # after "pid (comm)": [0]=state [1]=ppid ... [11]=utime [12]=stime
            procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
        except (OSError, IndexError, ValueError):
            continue
    out: dict[int, int] = {}
    for pid, (_, cpu) in procs.items():
        p = pid
        while p > 1:
            if p == root:
                out[pid] = cpu
                break
            p = procs.get(p, (0, 0))[0]
    return out


def tree_cpu_seconds(root_pid: int | None = None) -> float:
    """Cumulative utime+stime seconds of root_pid and alive descendants."""
    return sum(subtree_own_ticks(root_pid).values()) / _HZ


class ExternalLoadMeter:
    """Average external cores busy over start()..stop() windows.

    A background thread polls the process subtree every ``POLL_S`` seconds,
    accumulating per-PID utime+stime increments — churn-proof against
    pyspark's SIG_IGN worker reaping (see module docstring). PIDs first
    seen mid-window are credited their full CPU at first sight (they were
    forked after the window opened); PIDs present at ``start()`` are
    baselined so pre-window CPU is not counted.

    ``pinned_cores``: size N of the job's taskset range [0, N); when N is
    below the machine's core count, ``last_outside_pinned_cores`` reports
    busy cores outside that range — the churn-proof neighbor signal.
    After ``stop()``, ``last_steal_cores`` carries the hypervisor-steal
    component of the external figure for the same window.
    """

    POLL_S = 2.0

    last_steal_cores: float = 0.0
    last_outside_pinned_cores: float = 0.0
    last_own_cores: float = 0.0
    last_ballast_cores: float = 0.0

    def __init__(
        self,
        pinned_cores: int | None = None,
        poll_s: float | None = None,
        ballast_pids: frozenset[int] | None = None,
    ) -> None:
        self._pinned = pinned_cores
        self._root = os.getpid()
        self._ballast_pids = ballast_pids or frozenset()
        if poll_s is not None:
            self.POLL_S = poll_s

    def _poll_once(self) -> None:
        now = subtree_own_ticks(self._root)
        for pid, ticks in now.items():
            prev = self._seen.get(pid)
            if prev is None:
                # forked after the window opened: whole life is in-window
                inc = ticks
            elif ticks > prev:
                inc = ticks - prev
            else:
                # ticks < prev would mean PID reuse; treat as no increment
                inc = 0
            self._acc += inc
            if pid in self._ballast_pids:
                # frequency-pinning ballast (scripts/ballast.py): own load by
                # accounting (it is our child), but tracked separately so the
                # outside-pinned neighbor signal can exclude it — ballast is
                # pinned outside the taskset range by construction
                self._ballast_acc += inc
        self._seen = dict(now)

    def _poll_loop(self) -> None:
        while not self._stop_evt.wait(self.POLL_S):
            self._poll_once()

    def start(self) -> None:
        import threading
        import time

        self._t0 = time.time()
        self._busy0 = machine_busy_seconds()
        self._steal0 = steal_seconds()
        self._init0 = init_reaped_seconds()
        self._percpu0 = percpu_busy_seconds() if self._pinned else None
        # baseline: CPU burned before the window is not this window's own
        self._seen = subtree_own_ticks(self._root)
        self._acc = 0
        self._ballast_acc = 0
        self._stop_evt = threading.Event()
        self._thread = threading.Thread(target=self._poll_loop, daemon=True)
        self._thread.start()

    def stop(self) -> float:
        import time

        self._stop_evt.set()
        self._thread.join(timeout=self.POLL_S + 1)
        self._poll_once()
        wall = max(time.time() - self._t0, 1e-6)
        busy = machine_busy_seconds() - self._busy0
        steal = steal_seconds() - self._steal0
        # own = polled subtree increments + workers that died orphaned into
        # init's cutime/cstime inside the window (disjoint: an orphan's ppid
        # chain breaks at 1, so polls never counted it)
        own = self._acc / _HZ + (init_reaped_seconds() - self._init0)
        self.last_steal_cores = max(steal / wall, 0.0)
        self.last_own_cores = own / wall
        self.last_ballast_cores = self._ballast_acc / _HZ / wall
        if self._percpu0 is not None:
            now = percpu_busy_seconds()
            outside = sum(
                now[c] - self._percpu0[c]
                for c in now
                if c >= self._pinned and c in self._percpu0
            )
            # ballast runs SCHED_IDLE on the complement cores: any real
            # neighbor there preempts it, so neighbors = outside - ballast
            self.last_outside_pinned_cores = max(
                (outside - self._ballast_acc / _HZ) / wall, 0.0
            )
        return max((busy - own) / wall, 0.0)
