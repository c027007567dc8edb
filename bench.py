"""Benchmark harness: headline queries + KG-pipeline throughput.

Runs the headline contract queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and the flagship
KG-construction pipeline over a deterministic synthetic interleaved corpus
sized to the scale factor. Prints ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "pipeline": {"n_docs": ..., "n_triples": ..., "wall_sec": ...,
                  "triples_per_sec": ...}, "cpus": 32}

Scaling-efficiency evidence (N vs 4N parallelism) is produced by
``tools/bench_scaling.py`` which invokes this file at two core counts.

Per-query time is the min of ``$SPARK_GRAFT_REPEATS`` (default 2)
back-to-back executions after one synthetic warm-up job: this host shows
3× single-shot swings on identical code (external noise episodes), and the
min-of-legs is the standard way to report engine cost rather than host
weather. The scaling harnesses pin REPEATS=1 and interleave their own legs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "map_vertex_insert",
    "map_edge_rank",
    "map_statements_vertex",
    "map_type_conversions",
    "map_apply_upsert",
    "text_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "kg_triples_docs",
    "kg_canonicalize_cc",
    "kg_canonicalize_lsh",
    "kg_skew_twophase",
    "kg_pagerank",
    "text_topk_ngrams",
    "cluster_kmeans",
    "spans_roundtrip",
    "multimodal_features",
    "stream_windowed_counts",
    "stream_sessions",
]


def _force(df) -> int:
    """Fully execute a DataFrame without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from nebula_importer_spark.contract import QUERIES
    from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
    from nebula_importer_spark.pipeline.corpus import synthetic_corpus
    from nebula_importer_spark.pipeline.run import run_pipeline
    from nebula_importer_spark.session import get_spark

    # SPARK_GRAFT_MASTER overrides the master entirely — the executor-
    # isolated scaling harness (tools/bench_cluster.py) passes
    # local-cluster[n,c,m] so each leg runs real executor JVMs
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = get_spark(
        app_name="nebula-importer-spark-bench",
        master=master,
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    # one synthetic job before timing: spins up executor threads, Python
    # workers, and the shuffle machinery so the first measured query reports
    # engine cost, not JVM/codegen cold start. Touches NO benchmark data.
    spark.range(0, 1_000_000, numPartitions=4).repartition(
        max(cpus, 32)
    ).groupBy((F.col("id") % 97).alias("k")).count().write.format("noop").mode(
        "overwrite"
    ).save()

    # per-query time = min over SPARK_GRAFT_REPEATS (default 2) back-to-back
    # executions. This host shows 3× single-shot swings on identical code
    # (external noise episodes — see BENCH/BASELINE.md methodology); the min
    # of two legs reports the engine's cost, not the host's worst moment.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    timings: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_HEADLINE", "1") != "0":
        for name in HEADLINE:
            fn = QUERIES[name]
            best = None
            for _ in range(repeats):
                t0 = time.time()
                _force(fn(spark, sf_dir))
                leg = time.time() - t0
                best = leg if best is None else min(best, leg)
            timings[name] = round(best, 3)

    # flagship pipeline throughput on a corpus sized to the scale factor;
    # SPARK_GRAFT_PIPE_DOCS overrides (the scaling harness uses a larger
    # corpus so per-doc compute, not job scheduling, dominates wall time)
    n_docs = int(
        os.environ.get("SPARK_GRAFT_PIPE_DOCS", max(500, int(sf * 50_000)))
    )
    # materialize the corpus first: the pipeline's contract input is a table
    # (input_hint: Iceberg), not an inline generator expression — timing the
    # run from parquet keeps the generator's huge codegen out of every
    # downstream stage plan and out of the measurement
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        synthetic_corpus(
            spark, n_docs=n_docs, seed=42, fixture_rows=PERSON_CSV_LINES,
            partitions=max(cpus, 8),
        ).write.mode("overwrite").parquet(f"{tmp}/corpus")
        corpus = spark.read.parquet(f"{tmp}/corpus")
        wall = None
        for _ in range(repeats):
            t0 = time.time()
            result = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])
            n_triples = result.triples.count()
            leg = time.time() - t0
            wall = leg if wall is None else min(wall, leg)
            # release the run's caches so back-to-back legs don't accumulate
            # executor memory (each leg measures the engine, not eviction)
            result.unpersist()
        timings["kg_pipeline"] = round(wall, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "pipeline": {
            "n_docs": n_docs,
            "n_triples": n_triples,
            "wall_sec": round(wall, 3),
            "triples_per_sec": round(n_triples / wall, 1),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
