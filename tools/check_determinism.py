"""Cross-parallelism determinism check for the KG pipeline.

The north rule claims any schedule of waves/kills/retries converges to the
same table as one uninterrupted run — which implies the pipeline output is a
pure function of its input, independent of parallelism. Round-1 bench data
contradicted that (2,607,638 triples at local[2] vs 2,607,410 at local[8] on
the same seeded 400k-doc corpus, VERDICT.md "What's wrong" #2). This tool
reproduces and localizes such divergence:

1. materialize ONE corpus parquet (seeded generator, partition-independent);
2. run the pipeline in two subprocesses at different local[N] levels, each
   dumping per-stage row counts + order-insensitive sha256 hashes
   (pairs → canon → mentions → linked → triples);
3. diff stage by stage — the first diverging stage is the culprit.

Usage: python tools/check_determinism.py [n_docs] [cpus_a] [cpus_b]
Exit 0 iff every stage hash matches.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage_hashes(cpus: int, corpus_path: str, out_path: str) -> None:
    """Child-process body: run the pipeline, hash every stage output."""
    import hashlib

    from pyspark.sql import DataFrame

    from nebula_importer_spark.fixtures import person_spec
    from nebula_importer_spark.pipeline.run import run_pipeline
    from nebula_importer_spark.session import get_spark

    spark = get_spark(
        app_name=f"determinism-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    result = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])

    def h(df: DataFrame) -> dict:
        rows = sorted(
            "\x1f".join("\\N" if v is None else str(v) for v in r) for r in df.collect()
        )
        dig = hashlib.sha256()
        for line in rows:
            dig.update(line.encode())
            dig.update(b"\x1e")
        return {"rows": len(rows), "hash": dig.hexdigest()[:16]}

    stages = {
        "canonical": h(result.canonical),
        "stats": h(result.stats),
        "triples": h(result.triples),
    }
    with open(out_path, "w") as f:
        json.dump(stages, f)
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _stage_hashes(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return 0

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus_a = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus_b = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    tmp = tempfile.mkdtemp(prefix="determinism_")
    try:
        # materialize ONE corpus both legs read (the generator itself is
        # partition-independent, but sharing the parquet removes even that
        # variable from the experiment)
        gen = subprocess.run(
            [
                sys.executable,
                "-c",
                f"""
import sys; sys.path.insert(0, {REPO!r})
from nebula_importer_spark.fixtures import PERSON_CSV_LINES
from nebula_importer_spark.pipeline.corpus import synthetic_corpus
from nebula_importer_spark.session import get_spark
spark = get_spark(app_name="gen", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
synthetic_corpus(spark, n_docs={n_docs}, seed=42,
                 fixture_rows=PERSON_CSV_LINES, partitions=8
                 ).write.mode("overwrite").parquet({tmp!r} + "/corpus")
spark.stop()
""",
            ],
            capture_output=True,
            text=True,
        )
        if gen.returncode != 0:
            print(gen.stderr[-2000:])
            return 2

        outs = {}
        for cpus in (cpus_a, cpus_b):
            out_path = f"{tmp}/stages_{cpus}.json"
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--child",
                    str(cpus),
                    f"{tmp}/corpus",
                    out_path,
                ],
                capture_output=True,
                text=True,
            )
            if r.returncode != 0:
                print(r.stderr[-2000:])
                return 2
            with open(out_path) as f:
                outs[cpus] = json.load(f)

        ok = True
        for stage in outs[cpus_a]:
            a, b = outs[cpus_a][stage], outs[cpus_b][stage]
            match = a == b
            ok = ok and match
            print(
                f"{'ok  ' if match else 'DIFF'} {stage}: "
                f"local[{cpus_a}]={a['rows']}/{a['hash']} "
                f"local[{cpus_b}]={b['rows']}/{b['hash']}"
            )
        print(json.dumps({"n_docs": n_docs, "deterministic": ok}))
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
