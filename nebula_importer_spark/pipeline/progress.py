"""Live progress stats: records/s, % complete, ETA at a fixed interval.

Spark analog of the reference's stats printer (``/root/reference/pkg/stats/
stats.go:38-92``: a ticker logs processed-record count, percentage, rate and
ETA every ``manager.statsInterval``). Here a daemon thread polls
``SparkContext.statusTracker()`` — task counts across the job's active
stages — and emits one stats row per tick. Task-level progress is the
cluster-honest equivalent of the reference's record counter: Spark executors
don't stream per-row counts to the driver, and polling the status tracker
costs O(active stages), not a job.

Rows accumulate in :attr:`ProgressReporter.rows` (and go to ``callback`` if
given) so a pipeline can persist them alongside its lineage table —
``run_pipeline(..., stats_interval_sec=...)`` does exactly that via
``PipelineResult.progress``.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional


class ProgressReporter:
    """Poll Spark task progress on a timer; emit stats rows.

    Each row: ``{t_sec, active_stages, completed_tasks, total_tasks, pct,
    tasks_per_sec, eta_sec}`` where totals span every stage observed since
    start (stages enter the set when they become active, so ``pct`` is
    monotone within a stage wave but can drop when a new stage arrives —
    same behavior as the reference's per-file percentage resets,
    stats.go:58-66).
    """

    def __init__(
        self,
        spark,
        interval_sec: float = 10.0,
        callback: Optional[Callable[[dict], None]] = None,
    ):
        self._tracker = spark.sparkContext.statusTracker()
        self.interval_sec = interval_sec
        self.callback = callback
        self.rows: list[dict] = []
        self._seen_stages: set[int] = set()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._t0 = 0.0

    def _sample(self) -> dict:
        active = self._tracker.getActiveStageIds()
        self._seen_stages.update(active)
        # register every stage of active jobs too (incl. pending/just-done
        # stages a tick would otherwise miss between polls)
        for jid in self._tracker.getActiveJobsIds():
            info = self._tracker.getJobInfo(jid)
            if info is not None:
                self._seen_stages.update(info.stageIds)
        done = total = 0
        for sid in sorted(self._seen_stages):
            info = self._tracker.getStageInfo(sid)
            if info is None:
                continue
            total += info.numTasks
            done += info.numCompletedTasks
        elapsed = time.time() - self._t0
        rate = done / elapsed if elapsed > 0 else 0.0
        remaining = max(total - done, 0)
        row = {
            "t_sec": round(elapsed, 3),
            "active_stages": len(active),
            "completed_tasks": done,
            "total_tasks": total,
            "pct": round(done / total, 4) if total else 0.0,
            "tasks_per_sec": round(rate, 2),
            "eta_sec": round(remaining / rate, 1) if rate > 0 else None,
        }
        return row

    def _run(self) -> None:
        while not self._stop.wait(self.interval_sec):
            row = self._sample()
            self.rows.append(row)
            if self.callback is not None:
                self.callback(row)

    def start(self) -> "ProgressReporter":
        self._t0 = time.time()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # final sample so even sub-interval runs record one row
        self.rows.append(self._sample())

    def __enter__(self) -> "ProgressReporter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
