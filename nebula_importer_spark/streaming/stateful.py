"""Custom stateful streaming operator: per-key session aggregation.

``applyInPandasWithState`` implements what no built-in windowed agg can
express: sessions that close after ``gap`` seconds of per-key inactivity,
emitting one row per closed session. The state (count + last-seen + session
start) lives in the state store, bounded by the event-time timeout — this is
the Structured Streaming analog of the reference fork's per-task stats
accumulation (``/root/reference/pkg/task/importer.go:42-53``), upgraded from
process-local counters to fault-tolerant keyed state.

Session semantics are exact event-time gap sessionization: a batch's
timestamps are sorted and split wherever consecutive events are more than
``gap`` apart; every segment but the last is a *closed* session (a later
in-batch event proves no event can extend it) and is emitted immediately,
while the last stays open in the state store until the watermark passes its
end + gap. This makes a replayed static table produce exactly the batch
definition — per key, order by ts, break where ts − lag(ts) > gap — so the
operator is fully oracle-checkable in SQL (contract query
``stream_sessions``). Cross-batch arrivals are assumed per-key event-time
monotone up to the watermark (true for file replay and key-partitioned
logs); a straggler landing inside the open session merges into it rather
than re-splitting history.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
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


def _sessions_frame(rows: list[tuple[str, int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [r[0] for r in rows],
            "session_start": [pd.Timestamp(r[1], unit="ms") for r in rows],
            "session_end": [pd.Timestamp(r[2], unit="ms") for r in rows],
            "n_events": [r[3] for r in rows],
        }
    )


def sessionize(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 300,
) -> DataFrame:
    """Close a session per key after ``gap_seconds`` of event-time inactivity.

    Input must carry (key string, ts timestamp) and a watermark on ``ts``.
    Emits (key, session_start, session_end, n_events): in-batch-closed
    segments immediately, the trailing open session when the watermark
    passes its end + gap. State is O(active keys); late rows beyond the
    watermark are dropped by the engine before reaching the function.

    The per-key segmentation is vectorized (numpy sort + diff over the
    batch's epoch-ms), so a hot key's million-event batch costs one sort,
    not a Python loop.
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield _sessions_frame([(key[0], start_ms, last_ms, n)])
            return
        chunks = [
            (pdf[ts_col].astype("int64") // 1_000_000).to_numpy() for pdf in pdfs
        ]
        ts = np.sort(np.concatenate(chunks)) if chunks else np.array([], "int64")
        if ts.size == 0:  # pragma: no cover — engine never calls with no data
            return
        # segment boundaries: events more than gap apart
        cuts = np.flatnonzero(np.diff(ts) > gap_ms)
        starts = np.concatenate(([0], cuts + 1))
        ends = np.concatenate((cuts, [ts.size - 1]))
        segs = [
            (int(ts[a]), int(ts[b]), int(b - a + 1)) for a, b in zip(starts, ends)
        ]
        if state.exists:
            start_ms, last_ms, n = state.get
            if segs[0][0] - last_ms <= gap_ms:
                # first segment extends the open session (stragglers within
                # the open span merge; history is never re-split)
                s0, e0, n0 = segs[0]
                segs[0] = (min(start_ms, s0), max(last_ms, e0), n + n0)
            else:
                segs.insert(0, (start_ms, last_ms, n))
        *closed, tail = segs
        state.update(tail)
        state.setTimeoutTimestamp(tail[1] + gap_ms)
        if closed:
            yield _sessions_frame([(key[0], s, e, c) for s, e, c in closed])

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
