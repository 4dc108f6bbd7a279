"""Sample host memory while a measurement runs.

Usage: python scripts/host_mem_sampler.py <out.jsonl> [interval_s]

Appends one JSON line per tick: MemAvailable/MemFree/Shmem/Cached from
/proc/meminfo (kB) plus a timestamp. Run it next to a cluster_job
measurement to catch the PEAK resident set — on this box the Spark local
dir is tmpfs, so shuffle blocks and parquet spills are RAM (Shmem), and a
python-worker crash with no OOM-kill visible in dmesg is usually the host
running out of memory inside the container. Stop with SIGTERM/SIGINT; the
file is flushed per line so a hard kill loses at most one tick.
"""

from __future__ import annotations

import json
import sys
import time


def read_meminfo() -> dict[str, int]:
    want = {"MemTotal", "MemFree", "MemAvailable", "Cached", "Shmem"}
    out: dict[str, int] = {}
    with open("/proc/meminfo") as f:
        for line in f:
            key, rest = line.split(":", 1)
            if key in want:
                out[key] = int(rest.strip().split()[0])
    return out


def main() -> None:
    path = sys.argv[1]
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    with open(path, "a") as f:
        while True:
            row = read_meminfo()
            row["ts"] = round(time.time(), 1)
            f.write(json.dumps(row) + "\n")
            f.flush()
            time.sleep(interval)


if __name__ == "__main__":
    main()
