"""Driver script for ``spark-submit --py-files`` — the contract launch shape.

BASELINE.json's north rule runs the pipeline "via spark-submit --py-files on
a multi-executor cluster". This script is that submission's application file:
it imports ``nebula_importer_spark`` ONLY from the ``--py-files`` zip (never
from a repo checkout on the driver's filesystem), builds the seeded synthetic
interleaved corpus, runs the full extract→link→canonicalize→materialize
pipeline, and prints one JSON line with the triple count and throughput.

Usage (two real executor JVMs):

    cd /tmp && zip -r nis.zip nebula_importer_spark   # from the repo root
    /opt/spark/bin/spark-submit \
        --master 'local-cluster[2,2,3072]' \
        --conf spark.executor.memory=2g \
        --py-files nis.zip \
        tools/submit_pipeline.py --docs 20000

On a real cluster the only change is the master URL (yarn / k8s / spark://).
``tests/test_submit.py`` runs this end-to-end and checks the emitted triple
count against the same pipeline run in-process.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=8)
    args = ap.parse_args()

    # master / executor sizing come from spark-submit flags; only the
    # session-level engine requirements (AQE, Arrow) are set here — the
    # same ones a gateway submission would pass via --conf.
    spark = (
        SparkSession.builder.appName("nebula-importer-spark-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deferred so the import provably resolves against the --py-files zip
    from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
    from nebula_importer_spark.pipeline.corpus import synthetic_corpus
    from nebula_importer_spark.pipeline.run import run_pipeline

    corpus = synthetic_corpus(
        spark,
        n_docs=args.docs,
        seed=args.seed,
        fixture_rows=PERSON_CSV_LINES,
        partitions=args.partitions,
    )
    t0 = time.time()
    result = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])
    n_triples = result.triples.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "n_docs": args.docs,
                "n_triples": n_triples,
                "wall_sec": round(wall, 3),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
