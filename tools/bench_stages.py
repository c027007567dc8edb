"""Per-stage scaling: time each pipeline stage at one parallelism level.

Usage: python tools/bench_stages.py <cpus> [n_docs]

Materializes the seeded corpus (same as bench.py), then times each stage's
full materialization (noop write) separately:

* lsh_pairs   — reassemble + MinHash-LSH near-dup pairs (portable=False)
* cc          — connected components over the pairs (delta vs lsh_pairs)
* extract     — explode spans + vectorized mention detection + linking
* pipeline    — the whole run_pipeline triples materialization

Run at two parallelism levels and compare per-stage speedups to find the
non-scaling stage. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from pyspark.sql import functions as F

    from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
    from nebula_importer_spark.operators.dedup import minhash_lsh_pairs
    from nebula_importer_spark.pipeline.canonicalize import canonical_mapping
    from nebula_importer_spark.pipeline.corpus import (
        explode_spans,
        reassemble,
        synthetic_corpus,
    )
    from nebula_importer_spark.pipeline.extract import doc_mentions, extract_mentions
    from nebula_importer_spark.pipeline.link import link_mentions
    from nebula_importer_spark.pipeline.run import (
        DEFAULT_ALIASES,
        DEFAULT_GAZETTEER,
        run_pipeline,
    )
    from nebula_importer_spark.session import get_spark

    spark = get_spark(
        app_name=f"stages-{cpus}", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stage_corpus_")
    out: dict = {"cpus": cpus, "n_docs": n_docs}
    try:
        synthetic_corpus(
            spark, n_docs=n_docs, seed=42, fixture_rows=PERSON_CSV_LINES, partitions=8
        ).write.mode("overwrite").parquet(f"{tmp}/corpus")
        corpus = spark.read.parquet(f"{tmp}/corpus").repartition(32, F.col("doc_id"))

        t0 = time.time()
        flat = reassemble(corpus.select("doc_id", "spans"))
        pairs = minhash_lsh_pairs(flat, threshold=0.6, portable=False)
        _force(pairs)
        out["lsh_pairs_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        canon = canonical_mapping(corpus.select("doc_id"), pairs)
        _force(canon)
        out["cc_incl_lsh_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        spans = explode_spans(corpus.select("doc_id", "spans"))
        mentions = doc_mentions(extract_mentions(spans, DEFAULT_GAZETTEER))
        alias_df = spark.createDataFrame(
            sorted(DEFAULT_ALIASES.items()), "term string, entity string"
        )
        linked = link_mentions(mentions, alias_df, skip_fuzzy=True)
        _force(linked)
        out["extract_link_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        result = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])
        _force(result.triples)
        out["pipeline_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
