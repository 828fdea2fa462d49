"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only "state machines" are its in-process line loops
(DDL accumulator ``log2sql.py:77-92``, event segmenter ``log2sql.py:97-99``).
The engine-level generalization: arbitrary keyed state that survives
across micro-batches, Arrow-batched per group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)
_STATE_SCHEMA = "events_seen LONG, total_value_cents LONG"


def _update_running_totals(
    key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + value (in exact cents) across
    micro-batches; emit the updated running total once per batch."""
    (user_id,) = key
    seen, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        seen += len(pdf)
        cents += int(round(pdf["value"].fillna(0.0).mul(100).round()).sum())
    state.update((seen, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "events_seen": [seen], "total_value_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user lifetime totals, updated each
    micro-batch. Works on a streaming events-shaped input."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTAL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def timed_out_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session aggregates emitted by EVENT-TIME TIMEOUT: a user's
    session closes when the watermark passes their last activity plus
    the gap — at which point the state is emitted AND REMOVED. This is
    the state-eviction discipline a long-running stream needs (the
    NoTimeout operators above keep state per key forever, fine for
    bounded key spaces; a 100 TB user stream is not bounded). The
    session payload carries custom fields (purchase flag) a plain
    ``session_window`` aggregate would need a second pass to attach.
    """
    import pandas as pd

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, has_purchase boolean"
    )
    state_schema = "start long, end long, n long, purch boolean"
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            start, end, n, purch = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                    "has_purchase": [purch],
                }
            )
            return
        start, end, n, purch = (
            state.get if state.exists else (None, None, 0, False)
        )
        for pdf in pdf_iter:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            start = min([*ts_ms, start] if start is not None else ts_ms)
            end = max([*ts_ms, end] if end is not None else ts_ms)
            n += len(pdf)
            purch = bool(purch or (pdf["event_type"] == "purchase").any())
        state.update((start, end, n, purch))
        # close the session once the EVENT-TIME watermark passes
        # last-activity + gap; the state is then handed back to this
        # function with hasTimedOut=True and removed.
        state.setTimeoutTimestamp(end + gap_ms)
        return
        yield  # pragma: no cover — makes this a generator on all paths

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
