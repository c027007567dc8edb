"""Executor-isolated scaling evidence: N vs 4N REAL executor JVMs.

VERDICT r2 ("Next round" #5): the local[N] thread-mode pairs conflate engine
scaling with host SMT/bandwidth ceilings; ``local-cluster[n,c,m]`` starts
real Worker+Executor JVMs, so the N→4N executor pair is the closest sandbox
analog of BASELINE.json's "N and 4N executors" rule — scale-OUT (more
executors of the same size), not scale-UP (one fatter JVM).

Default pair: 1×4-core executor vs 4×4-core executors (4 → 16 cores), same
per-executor memory, interleaved best-of-R legs (noisy-host estimator, same
methodology as tools/bench_scaling.py).

Usage: python tools/bench_cluster.py [n_exec_low] [n_exec_high] [cores_per_exec]
Writes BENCH/cluster.json; print a markdown row set for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(n_exec: int, cores: int, mem_per_core_gb: int, sf_dir: str) -> dict:
    worker_mb = (mem_per_core_gb * cores + 1) * 1024  # headroom over executor heap
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(n_exec * cores),
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},{cores},{worker_mb}]",
        SPARK_EXECUTOR_MEMORY=f"{mem_per_core_gb * cores}g",
        SPARK_DRIVER_MEMORY="8g",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_HEADLINE="0",
        SPARK_GRAFT_REPEATS="1",  # the harness interleaves its own best-of-N legs
        SPARK_GRAFT_PIPE_DOCS=os.environ.get("SPARK_GRAFT_PIPE_DOCS", "400000"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    mem = int(os.environ.get("SPARK_BENCH_MEM_PER_CORE", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_BENCH_REPEATS", "2"))

    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_leg(n_low, cores, mem, sf_dir))
        highs.append(run_leg(n_high, cores, mem, sf_dir))
    low = min(lows, key=lambda r: r["pipeline"]["wall_sec"])
    high = min(highs, key=lambda r: r["pipeline"]["wall_sec"])

    tl = low["pipeline"]["triples_per_sec"]
    th = high["pipeline"]["triples_per_sec"]
    eff = (th / tl) / (n_high / n_low)

    out_name = os.environ.get("SPARK_BENCH_OUT", "cluster.json")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    payload = {
        "mode": "local-cluster (real executor JVMs)",
        "stamp": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "pair": {
            "low": f"local-cluster[{n_low},{cores},*] = {n_low} executor(s) x {cores} cores",
            "high": f"local-cluster[{n_high},{cores},*] = {n_high} executors x {cores} cores",
        },
        "n_docs": low["pipeline"]["n_docs"],
        "n_triples": low["pipeline"]["n_triples"],
        "low_wall_sec": low["pipeline"]["wall_sec"],
        "high_wall_sec": high["pipeline"]["wall_sec"],
        "low_triples_per_sec": tl,
        "high_triples_per_sec": th,
        "efficiency": round(eff, 3),
        "repeats": repeats,
        "all_runs": {"low": lows, "high": highs},
    }
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"eff": round(eff, 3), "low": tl, "high": th}))


if __name__ == "__main__":
    main()
