"""Live progress reporter (reference pkg/stats/stats.go analog)."""

from __future__ import annotations

import time

from nebula_importer_spark.pipeline.corpus import synthetic_corpus
from nebula_importer_spark.pipeline.progress import ProgressReporter
from nebula_importer_spark.pipeline.run import run_pipeline


def test_progress_reporter_emits_rows(spark):
    def slow(it):
        time.sleep(0.6)  # make each task span several reporter ticks
        yield from it

    with ProgressReporter(spark, interval_sec=0.1) as rep:
        spark.sparkContext.parallelize(range(8), 4).mapPartitions(slow).count()
    assert rep.rows, "no stats rows captured"
    last = rep.rows[-1]
    assert last["total_tasks"] >= 4
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
