"""Validate the ballast mechanism (scripts/ballast.py) with pure CPU work.

Measures the same pinned jaro kernel as cpu_probe.py at three states,
interleaved per repeat so host-window drift hits all three equally:

  8 procs, no ballast          (the r01-r03 small-level hardware state)
  8 procs, ballast on 24 cores (the proposed small-level state)
  32 procs                      (the big-level state)

If the host all-core-frequency explanation is right, per-proc throughput of
"8 + ballast" matches the 32-proc per-proc figure, and the implied 8->32
ceiling under the ballast protocol is ~1.0 — i.e. the ballast removes the
single-box frequency artifact without adding contention of its own.

Usage: python scripts/ballast_probe.py [repeats] -> one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from scripts.ballast import ballast_on, complement_of  # noqa: E402
from scripts.smt_probe import run_set  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    run_set([0])  # warm imports
    eight = list(range(8))
    res: dict[str, list[float]] = {"plain8": [], "ballast8": [], "full32": []}
    for _ in range(repeats):
        res["plain8"].append(run_set(eight))
        with ballast_on(complement_of(eight)):
            res["ballast8"].append(run_set(eight))
        res["full32"].append(run_set(list(range(32))))
    best = {k: max(v) for k, v in res.items()}
    print(
        json.dumps(
            {
                "throughput_8_plain": round(best["plain8"], 1),
                "throughput_8_ballast": round(best["ballast8"], 1),
                "throughput_32": round(best["full32"], 1),
                "all": {k: [round(x, 1) for x in v] for k, v in res.items()},
                "ceiling_plain": round(best["full32"] / best["plain8"] / 4, 3),
                "ceiling_ballast": round(best["full32"] / best["ballast8"] / 4, 3),
                "ballast_slowdown_8c": round(
                    best["ballast8"] / best["plain8"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
