"""External-contention meter: churn-proof CPU attribution (no Spark).

The bench protocol's quiet-window gate lives or dies on this attribution:
pyspark workers die reparented to PID 1, so a naive subtree walk loses their
CPU and reports the job's own work as "external contention" (observed: ~17
phantom external cores and negative own-cores during a 4M-payload run).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

from biblib_spark.hostload import (
    ExternalLoadMeter,
    init_reaped_seconds,
    machine_busy_seconds,
    percpu_busy_seconds,
    tree_cpu_seconds,
)

# burn ~0.6s of CPU in a grandchild whose parent exits immediately: the
# grandchild is reparented to PID 1 and its CPU is reaped there, exactly like
# a pyspark worker outliving its daemon
_ORPHAN_BURNER = r"""
import os, sys, time
pid = os.fork()
if pid == 0:  # child: spawn the burner and exit at once -> burner orphans
    if os.fork() == 0:
        t = time.process_time()
        while time.process_time() - t < 0.6:
            sum(i * i for i in range(10000))
        os._exit(0)
    os._exit(0)
os.waitpid(pid, 0)
time.sleep(1.2)  # stay alive until the orphan finishes and init reaps it
"""


def test_meter_counts_orphan_reaped_cpu_as_own():
    m = ExternalLoadMeter()
    init0 = init_reaped_seconds()
    m.start()
    subprocess.run([sys.executable, "-c", _ORPHAN_BURNER], check=True)
    # init's reap bookkeeping lands with a short, variable delay
    for _ in range(30):
        if init_reaped_seconds() - init0 >= 0.4:
            break
        time.sleep(0.2)
    ext = m.stop()
    # the orphan's ~0.6s CPU must NOT appear as external contention (test
    # boxes can have real neighbors; allow a modest floor well below 0.6/1.2)
    assert m.last_own_cores > 0.2
    assert ext < m.last_own_cores + 0.35


def test_tree_cpu_counts_alive_subtree():
    t0 = tree_cpu_seconds()
    # burn CPU in a normally-reaped child (subprocess.run waits -> our cutime)
    subprocess.run(
        [sys.executable, "-c",
         "import time\nt=time.process_time()\n"
         "while time.process_time()-t<0.4: sum(i*i for i in range(10000))"],
        check=True,
    )
    assert tree_cpu_seconds() - t0 >= 0.3


def test_percpu_busy_matches_total():
    a_total, a_per = machine_busy_seconds(), percpu_busy_seconds()
    time.sleep(0.5)
    b_total, b_per = machine_busy_seconds(), percpu_busy_seconds()
    assert set(a_per) == set(range(os.cpu_count()))
    per_delta = sum(b_per[c] - a_per[c] for c in b_per)
    assert abs(per_delta - (b_total - a_total)) < 0.5


def test_init_reaped_monotonic_nonnegative():
    v = init_reaped_seconds()
    assert v >= 0.0
    assert init_reaped_seconds() >= v
