"""Before/after DDL hooks on the pipeline (O3 analog, manager/hooks.go)."""

from __future__ import annotations

from nebula_importer_spark.pipeline.corpus import synthetic_corpus
from nebula_importer_spark.pipeline.run import run_pipeline


def test_hooks_run_in_order(spark):
    corpus = synthetic_corpus(spark, 10, seed=3, partitions=2)
    run_pipeline(
        spark,
        corpus,
        before_hooks=[
            "CREATE OR REPLACE TEMP VIEW hook_marker AS SELECT 'before' AS phase"
        ],
        after_hooks=[
            "CREATE OR REPLACE TEMP VIEW hook_marker AS SELECT 'after' AS phase"
        ],
    )
    assert spark.table("hook_marker").collect()[0].phase == "after"
