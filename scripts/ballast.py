"""Frequency-pinning ballast: pure-ALU spinners on a set of cores.

Single-box emulation detail for the N-vs-4N scaling protocol: on a real
cluster, an N-executor job runs on N machines whose CPU frequency does not
depend on the other 3N machines being idle. On this one 32-vCPU box, a
taskset-pinned 8-core job leaves 24 cores idle, the host package clocks the
busy cores UP (all-core frequency scaling, measured ~30% per-core in
scripts/cpu_probe.py), and the small level gets hardware the big level never
sees — understating scaling efficiency by construction. Running ballast on
the complement cores pins the package to its all-core frequency state for
both levels, so core-count is the only variable — the faithful analog of
independent machines.

The spinner is integer ALU only (no memory traffic beyond its own few cache
lines): it must pin frequency without stealing memory bandwidth, because in
the 32-core level the other 24 cores run REAL work whose bandwidth use is
part of what we measure — the ballast emulates their frequency effect, and
memory-bus contention of the big level is left intact (and reported) rather
than added synthetically to the small one.

Runs at SCHED_IDLE (fallback nice 19) so kernel threads and any IO on those
cores preempt it freely.

Usage (context manager or CLI):
    with ballast_on(complement_of(range(8))): ...
    python scripts/ballast.py 8-31   # run until killed
"""

from __future__ import annotations

import contextlib
import multiprocessing as mp
import os
import sys


def _spin(core: int, stop) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    try:
        os.sched_setscheduler(0, os.SCHED_IDLE, os.sched_param(0))
    except (OSError, AttributeError):
        try:
            os.nice(19)
        except OSError:
            pass
    x = 1
    # check the stop flag rarely: ~1e6 ALU iterations per poll
    while not stop.is_set():
        for _ in range(1_000_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def complement_of(cores) -> list[int]:
    used = set(cores)
    return [c for c in range(os.cpu_count() or 1) if c not in used]


@contextlib.contextmanager
def ballast_on(cores: list[int]):
    """Spin one SCHED_IDLE ALU process per listed core for the duration.

    Yields the process list so callers can account the ballast PIDs' CPU
    separately (hostload.ExternalLoadMeter subtracts them from the
    outside-pinned neighbor signal)."""
    ctx = mp.get_context("spawn")
    stop = ctx.Event()
    procs = [ctx.Process(target=_spin, args=(c, stop), daemon=True) for c in cores]
    for p in procs:
        p.start()
    try:
        yield procs
    finally:
        stop.set()
        for p in procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()


def _parse_range(spec: str) -> list[int]:
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


if __name__ == "__main__":
    cores = _parse_range(sys.argv[1]) if len(sys.argv) > 1 else complement_of(range(8))
    with ballast_on(cores):
        try:
            import signal

            signal.pause()
        except KeyboardInterrupt:
            pass
