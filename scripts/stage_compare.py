"""Compare two stage profiles (8c vs 32c) repeat-by-repeat.

Usage: python scripts/stage_compare.py <evlog_small> <evlog_big> [gap_s]

Segments each app's stages into repeats (a driver gap > ``gap_s`` seconds
between consecutive stages marks a repeat boundary — the between-repeat
cleanup does non-stage work), picks the LAST repeat at each level (the
best-of sample the protocol reports comes from the post-JIT tail), aligns
its stages in submit order, and prints per-aligned-stage wall at both core
counts plus the implied per-stage speedup. Stages whose wall does not
shrink with cores ARE the fixed cost F of the scaling model in BASELINE.md
— this turns "F ~= 80 s by two-point fit" into a named list of stages.
"""

from __future__ import annotations

import json
import sys

from stage_profile import profile


def split_repeats(rows: list[dict], gap_ms: float) -> list[list[dict]]:
    reps: list[list[dict]] = [[]]
    last_end = None
    for r in rows:
        if last_end is not None and r["submit"] - last_end > gap_ms:
            reps.append([])
        reps[-1].append(r)
        last_end = max(last_end or 0, r["complete"])
    return reps


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    gap_ms = float(sys.argv[3]) * 1000 if len(sys.argv) > 3 else 5000.0
    out = {}
    reps = {}
    for label, path in (("small", small_path), ("big", big_path)):
        p = profile(path)
        rows = sorted(p["stages"], key=lambda r: r["submit"])
        rr = split_repeats(rows, gap_ms)
        # the measured repeats are the trailing segments; take the last
        seg = rr[-1]
        reps[label] = seg
        t0, t1 = seg[0]["submit"], max(r["complete"] for r in seg)
        out[f"{label}_n_segments"] = len(rr)
        out[f"{label}_last_seg_wall_s"] = round((t1 - t0) / 1000.0, 3)
        # driver gap inside the segment
        iv = sorted((r["submit"], r["complete"]) for r in seg)
        cov, cs, ce = 0, None, None
        for s, e in iv:
            if ce is None or s > ce:
                if ce is not None:
                    cov += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        cov += (ce - cs) if ce else 0
        out[f"{label}_seg_driver_gap_s"] = round((t1 - t0 - cov) / 1000.0, 3)

    pairs = []
    si, bi = reps["small"], reps["big"]
    n = min(len(si), len(bi))
    aligned = len(si) == len(bi)
    for k in range(n):
        s, b = si[k], bi[k]
        pairs.append(
            {
                "idx": k,
                "name": b["name"][:60],
                "tasks_small": s["tasks"],
                "tasks_big": b["tasks"],
                "wall_small_s": s["wall_s"],
                "wall_big_s": b["wall_s"],
                "par_small": s["parallelism"],
                "par_big": b["parallelism"],
                "speedup": round(s["wall_s"] / b["wall_s"], 2)
                if b["wall_s"] > 0
                else None,
            }
        )
    out["stages_aligned"] = aligned
    out["n_stages_small"] = len(si)
    out["n_stages_big"] = len(bi)
    # fixed-cost attribution: big-level wall in stages with speedup < 2
    out["big_wall_in_nonscaling_stages_s"] = round(
        sum(p["wall_big_s"] for p in pairs if p["speedup"] is not None and p["speedup"] < 2.0),
        3,
    )
    out["pairs"] = pairs
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
