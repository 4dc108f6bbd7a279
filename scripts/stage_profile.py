"""Parse a Spark event log into a fixed-cost profile of the run.

Usage: python scripts/stage_profile.py <eventlog-file-or-dir> [top_n]

Prints one JSON document:
- per-stage: wall (submit->complete), tasks, task-time sum, effective
  parallelism (task-time / wall), name
- totals: app wall, sum of stage walls, DRIVER GAP (app wall not covered by
  any running stage — pure scheduling/planning/collect latency, the
  core-count-independent term F of the scaling model in BASELINE.md),
  stage-wall at parallelism < K (stages that cannot use the big level's
  cores — the other F term).

The point: efficiency(N->4N) = (C/N + F) / (C/(4N) + F) / 4, so landing the
>=0.8 gate at a given input size is exactly the problem of driving F (driver
gaps + low-parallelism stage wall) below C/88. This script measures F
directly instead of inferring it from two-level fits.
"""

from __future__ import annotations

import json
import os
import sys


def _iter_events(path: str):
    # Spark 4 rolling logs: <dir>/eventlog_v2_<app>/events_*_<app>[.zstd]
    while os.path.isdir(path):
        entries = sorted(
            (os.path.join(path, f) for f in os.listdir(path)
             if not f.startswith(".") and not f.startswith("appstatus")),
            key=os.path.getmtime,
        )
        if not entries:
            raise SystemExit(f"no event logs in {path}")
        path = entries[-1]

    def _open(p):
        if p.endswith(".zstd"):
            import subprocess

            proc = subprocess.Popen(
                ["zstd", "-dc", p], stdout=subprocess.PIPE, text=True
            )
            return proc.stdout
        return open(p, "r", encoding="utf-8", errors="replace")

    with _open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def profile(path: str, low_par_k: int = 8) -> dict:
    stages: dict[tuple[int, int], dict] = {}
    task_time: dict[tuple[int, int], float] = {}
    task_count: dict[tuple[int, int], int] = {}
    extra: dict[tuple[int, int], dict] = {}
    app_start = app_end = None
    for ev in _iter_events(path):
        e = ev.get("Event", "")
        if e == "SparkListenerApplicationStart":
            app_start = ev.get("Timestamp")
        elif e == "SparkListenerApplicationEnd":
            app_end = ev.get("Timestamp")
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si.get("Stage Attempt ID", 0))
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub and comp:
                stages[key] = {
                    "stage": si["Stage ID"],
                    "submit": sub,
                    "complete": comp,
                    "wall_s": round((comp - sub) / 1000.0, 3),
                    "tasks": si.get("Number of Tasks", 0),
                    "name": si.get("Stage Name", "")[:100],
                }
        elif e == "SparkListenerTaskEnd":
            si = ev.get("Stage ID"), ev.get("Stage Attempt ID", 0)
            info = ev.get("Task Info", {})
            dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1000.0
            if dur > 0:
                task_time[si] = task_time.get(si, 0.0) + dur
                task_count[si] = task_count.get(si, 0) + 1
            m = ev.get("Task Metrics") or {}
            agg = extra.setdefault(
                si,
                {"gc_s": 0.0, "mem_spill_b": 0, "disk_spill_b": 0,
                 "shuf_read_b": 0, "shuf_write_b": 0, "cpu_s": 0.0,
                 "deser_s": 0.0, "ser_s": 0.0},
            )
            agg["gc_s"] += m.get("JVM GC Time", 0) / 1000.0
            agg["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
            agg["deser_s"] += m.get("Executor Deserialize Time", 0) / 1000.0
            agg["ser_s"] += m.get("Result Serialization Time", 0) / 1000.0
            agg["mem_spill_b"] += m.get("Memory Bytes Spilled", 0)
            agg["disk_spill_b"] += m.get("Disk Bytes Spilled", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            agg["shuf_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            sw = m.get("Shuffle Write Metrics") or {}
            agg["shuf_write_b"] += sw.get("Shuffle Bytes Written", 0)

    rows = []
    for key, s in stages.items():
        tt = task_time.get(key, 0.0)
        s["task_time_s"] = round(tt, 3)
        s["parallelism"] = round(tt / s["wall_s"], 2) if s["wall_s"] > 0 else 0.0
        ex = extra.get(key)
        if ex:
            s["gc_s"] = round(ex["gc_s"], 3)
            s["cpu_s"] = round(ex["cpu_s"], 3)
            s["deser_s"] = round(ex["deser_s"], 3)
            s["mem_spill_mb"] = round(ex["mem_spill_b"] / 1e6, 1)
            s["disk_spill_mb"] = round(ex["disk_spill_b"] / 1e6, 1)
            s["shuf_read_mb"] = round(ex["shuf_read_b"] / 1e6, 1)
            s["shuf_write_mb"] = round(ex["shuf_write_b"] / 1e6, 1)
        rows.append(s)
    rows.sort(key=lambda r: r["submit"])

    # merge stage intervals -> covered wall; gaps = driver-side time
    intervals = sorted((r["submit"], r["complete"]) for r in rows)
    covered = 0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s

    t0 = app_start if app_start else (rows[0]["submit"] if rows else 0)
    t1 = app_end if app_end else (rows[-1]["complete"] if rows else 0)
    wall = (t1 - t0) / 1000.0
    low_par_wall = sum(
        r["wall_s"] for r in rows if r["parallelism"] < low_par_k and r["wall_s"] > 0.2
    )
    return {
        "app_wall_s": round(wall, 3),
        "stage_covered_s": round(covered / 1000.0, 3),
        "driver_gap_s": round(wall - covered / 1000.0, 3),
        f"stage_wall_below_par{low_par_k}_s": round(low_par_wall, 3),
        "n_stages": len(rows),
        "stages": rows,
    }


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(os.environ.get("SPARK_GRAFT_LOWPAR_K", "8"))
    p = profile(path, low_par_k=k)
    slim = dict(p)
    slim["stages"] = sorted(p["stages"], key=lambda r: -r["wall_s"])[:top_n]
    print(json.dumps(slim, indent=1))


if __name__ == "__main__":
    main()
