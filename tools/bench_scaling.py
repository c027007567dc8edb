"""Scaling-efficiency evidence: the same job at N and 4N parallelism.

BASELINE.json's rule requires throughput scaling efficiency ≥ 0.8 from N to
4N executors; in this sandbox (single machine, local mode) the evidence is
the same input processed at ``local[8]`` and ``local[32]``. Each run is a
separate process (a JVM cannot change master); results are written to
``BENCH/BASELINE.md`` alongside the per-query numbers.

Usage: python tools/bench_scaling.py [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # scaling runs measure the pipeline only, on a corpus big enough
        # that per-doc compute (not job scheduling) dominates
        SPARK_GRAFT_HEADLINE="0",
        SPARK_GRAFT_REPEATS="1",  # the harness interleaves its own best-of-N legs
        SPARK_GRAFT_PIPE_DOCS=os.environ.get("SPARK_GRAFT_PIPE_DOCS", "20000"),
        # heap scales with cores (2 GiB/core), like GC threads: a real
        # N-core executor has N×per-core memory; a fixed heap starves the
        # big leg (1 GiB/core at local[8] vs 4 at local[2]) and measures
        # GC pressure, not the engine
        SPARK_DRIVER_MEMORY=(
            f"{int(os.environ.get('SPARK_BENCH_MEM_PER_CORE', '2')) * cpus}g"
        ),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # best-of-R per leg, legs interleaved: this host shows transient noise
    # episodes (one observed local[8] leg ran 38% slow with identical code);
    # min wall per leg is the standard noisy-host estimator
    repeats = int(os.environ.get("SPARK_BENCH_REPEATS", "2"))
    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_bench(n_low, sf_dir))
        highs.append(run_bench(n_high, sf_dir))
    low = min(lows, key=lambda r: r["pipeline"]["wall_sec"])
    high = min(highs, key=lambda r: r["pipeline"]["wall_sec"])

    tl = low["pipeline"]["triples_per_sec"]
    th = high["pipeline"]["triples_per_sec"]
    eff = (th / tl) / (n_high / n_low)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    with open(path, "w") as f:
        f.write(f"""# BENCH — measured baselines ({stamp})

Same job (KG pipeline: extract → link → canonicalize → materialize over a
seeded synthetic interleaved corpus, {low['pipeline']['n_docs']} docs,
{low['pipeline']['n_triples']} triples) on identical input at two
parallelism levels — the sandbox evidence for BASELINE.json's N→4N
scaling-efficiency rule.

| parallelism | pipeline wall (s) | triples/sec |
|---|---|---|
| local[{n_low}] | {low['pipeline']['wall_sec']} | {tl} |
| local[{n_high}] | {high['pipeline']['wall_sec']} | {th} |

**Scaling efficiency (throughput ratio / core ratio): {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)

Per-query seconds at local[{n_high}]:

| query | sec |
|---|---|
""")
        for k, v in high["queries"].items():
            f.write(f"| {k} | {v} |\n")
        f.write(f"\nRaw JSON (best of {repeats} interleaved runs per leg; all runs):\n\n")
        for r in [*lows, *highs]:
            f.write(f"    {json.dumps(r)}\n")
        # stable methodology + determinism sections survive each overwrite
        appendix = os.path.join(REPO, "tools", "baseline_appendix.md")
        if os.path.exists(appendix):
            with open(appendix) as a:
                f.write("\n" + a.read())
    print(json.dumps({"eff": round(eff, 3), "low": tl, "high": th}))


if __name__ == "__main__":
    main()
