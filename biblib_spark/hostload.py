"""External-contention measurement for bench runs on a shared host.

``loadavg`` cannot distinguish a bench job's OWN load from noisy neighbors
(a 32-core job legitimately drives loadavg to ~32). This module measures it
directly: machine-wide busy CPU seconds (/proc/stat) minus the CPU seconds
consumed by THIS process's subtree (the Spark JVM + python workers), over a
wall-clock window. The difference, divided by the window, is the average
number of cores consumed by everyone else — the quantity a load gate must
test.

Approximation: subtree CPU is sampled from /proc/<pid>/stat of processes
alive at sample time; short-lived helpers that die inside the window escape
the subtree sum and inflate "external" slightly (conservative direction for
a quiet-window gate).
"""

from __future__ import annotations

import os

_HZ = os.sysconf("SC_CLK_TCK")


def machine_busy_seconds() -> float:
    """Cumulative busy (non-idle, non-iowait) CPU seconds across all cores."""
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return (sum(v) - v[3] - v[4]) / _HZ


def tree_cpu_seconds(root_pid: int | None = None) -> float:
    """Cumulative utime+stime seconds of root_pid and all its descendants."""
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
    total = 0
    for pid, (_, cpu) in procs.items():
        p = pid
        while p > 1:
            if p == root:
                total += cpu
                break
            p = procs.get(p, (0, 0))[0]
    return total / _HZ


class ExternalLoadMeter:
    """Average external cores busy over start()..stop() windows."""

    def start(self) -> None:
        import time

        self._t0 = time.time()
        self._busy0 = machine_busy_seconds()
        self._tree0 = tree_cpu_seconds()

    def stop(self) -> float:
        import time

        wall = max(time.time() - self._t0, 1e-6)
        busy = machine_busy_seconds() - self._busy0
        tree = tree_cpu_seconds() - self._tree0
        return max((busy - tree) / wall, 0.0)
