"""Custom stateful streaming operator: per-key session aggregation.

``applyInPandasWithState`` implements what no built-in windowed agg can
express: sessions that close after ``gap`` seconds of per-key inactivity,
emitting one row per closed session. The state (count + last-seen + session
start) lives in the state store, bounded by the event-time timeout — this is
the Structured Streaming analog of the reference fork's per-task stats
accumulation (``/root/reference/pkg/task/importer.go:42-53``), upgraded from
process-local counters to fault-tolerant keyed state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("last_ms", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def sessionize(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 300,
) -> DataFrame:
    """Close a session per key after ``gap_seconds`` of inactivity.

    Input must carry (key string, ts timestamp) and a watermark on ``ts``.
    Emits (key, session_start, session_end, n_events) when a session closes
    (on timeout). State is O(active keys); late rows beyond the watermark
    are dropped by the engine before reaching the function.
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
            n += len(pdf)
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        return
        yield  # pragma: no cover — generator form required by the API

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
