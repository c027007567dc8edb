"""Structured Streaming surface.

The reference is one-shot batch (its fork adds cron re-runs,
``/root/reference/pkg/task/taskmgr.go:174-188``); the streaming module is
the Spark-native upgrade of that slot: the same mapping core runs unchanged
over ``readStream`` sources, because every mapping operator is a stateless
projection/filter (streaming-compatible by construction).
"""
