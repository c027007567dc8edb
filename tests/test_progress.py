"""Live progress reporter (reference pkg/stats/stats.go analog)."""

from __future__ import annotations

import time

from nebula_importer_spark.pipeline.corpus import synthetic_corpus
from nebula_importer_spark.pipeline.progress import ProgressReporter
from nebula_importer_spark.pipeline.run import run_pipeline


def test_progress_reporter_emits_rows(spark):
    with ProgressReporter(spark, interval_sec=0.2) as rep:
        spark.range(0, 2_000_000, numPartitions=64).selectExpr("sum(id)").collect()
        time.sleep(0.5)  # guarantee at least one timer tick
    assert rep.rows, "no stats rows captured"
    last = rep.rows[-1]
    assert last["total_tasks"] >= 64
    assert 0 < last["completed_tasks"] <= last["total_tasks"]
    assert 0 <= last["pct"] <= 1
    assert last["tasks_per_sec"] > 0
    # ticks are ordered in time
    ts = [r["t_sec"] for r in rep.rows]
    assert ts == sorted(ts)


def test_pipeline_progress_rows(spark):
    corpus = synthetic_corpus(spark, 200)
    res = run_pipeline(spark, corpus, stats_interval_sec=0.2)
    assert res.progress
    assert res.progress[-1]["completed_tasks"] > 0
