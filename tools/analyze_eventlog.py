"""Summarize a Spark event log: per-stage wall vs task time, dead gaps.

Companion to the scaling harnesses: run any bench leg with
``SPARK_GRAFT_EVENTLOG=/tmp/spark-events`` (see ``session.get_spark``), then

    python tools/analyze_eventlog.py /tmp/spark-events/<app-dir-or-file>

Prints the top stages by wall time with their aggregate task metrics
(executor run / GC / deserialize / shuffle-fetch-wait) and the dead time
between stages (driver planning, AQE re-optimization, job submission gaps) —
the quantities that separate "the engine doesn't scale" from "the host or
the scheduler is in the way" when reading a scaling-efficiency number.

Handles both single-file logs and the v2 rolling directory layout
(``eventlog_v2_*/events_*``), zstd-compressed or plain.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
from collections import defaultdict


def _event_lines(path: str):
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "events_*")))
        if not inner:
            sub = sorted(glob.glob(os.path.join(path, "eventlog_v2_*")))
            inner = sorted(glob.glob(os.path.join(sub[-1], "events_*"))) if sub else []
        if not inner:
            raise SystemExit(f"no events_* file under {path}")
        files = inner
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            out = subprocess.run(
                ["zstd", "-d", "-c", f], capture_output=True, check=True
            )
            yield from out.stdout.decode().splitlines()
        else:
            with open(f) as fh:
                yield from fh


def main() -> None:
    path = sys.argv[1]
    stages: dict[tuple[int, int], dict] = {}
    tasks = defaultdict(lambda: {"run": 0, "gc": 0, "deser": 0, "fetch": 0})
    app_start = app_end = None

    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "sub": si.get("Submission Time"),
                "done": si.get("Completion Time"),
                "ntask": si["Number of Tasks"],
            }
        elif e == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            m = ev.get("Task Metrics") or {}
            t = tasks[key]
            t["run"] += m.get("Executor Run Time", 0)
            t["gc"] += m.get("JVM GC Time", 0)
            t["deser"] += m.get("Executor Deserialize Time", 0)
            t["fetch"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Fetch Wait Time", 0
            )

    rows = []
    for key, s in stages.items():
        if s["sub"] is None or s["done"] is None:
            continue
        rows.append(((s["done"] - s["sub"]) / 1000.0, key[0], s, tasks[key]))
    rows.sort(reverse=True)

    print(f"stages={len(rows)} sum(stage wall)={sum(r[0] for r in rows):.1f}s")
    if app_start and app_end:
        print(f"app wall={(app_end - app_start) / 1000:.1f}s")
    print(
        f"{'wall_s':>7} {'stage':>5} {'ntask':>5} {'run_s':>7} {'gc_s':>6} "
        f"{'deser_s':>7} {'fetch_s':>7}  name"
    )
    for wall, sid, s, t in rows[:25]:
        print(
            f"{wall:7.1f} {sid:5d} {s['ntask']:5d} {t['run'] / 1000:7.1f} "
            f"{t['gc'] / 1000:6.1f} {t['deser'] / 1000:7.1f} "
            f"{t['fetch'] / 1000:7.1f}  {s['name']}"
        )

    # dead time between consecutive stages = driver/scheduler-only intervals
    iv = sorted((s["sub"], s["done"]) for _, _, s, _ in rows)
    if iv:
        covered, gaps = 0, []
        cur_s, cur_e = iv[0]
        for s0, e0 in iv[1:]:
            if s0 > cur_e:
                gaps.append((cur_e, s0))
                covered += cur_e - cur_s
                cur_s, cur_e = s0, e0
            else:
                cur_e = max(cur_e, e0)
        covered += cur_e - cur_s
        span = cur_e - iv[0][0]
        print(
            f"\nstage-covered={covered / 1000:.1f}s span={span / 1000:.1f}s "
            f"dead-between-stages={(span - covered) / 1000:.1f}s "
            f"ngaps={len(gaps)}"
        )
        gaps.sort(key=lambda g: g[1] - g[0], reverse=True)
        for g0, g1 in gaps[:10]:
            print(f"  gap {(g1 - g0) / 1000:6.1f}s at t+{(g0 - iv[0][0]) / 1000:.1f}s")


if __name__ == "__main__":
    main()
