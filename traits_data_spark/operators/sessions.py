"""Sessionization: group an event stream into per-user sessions split
at inactivity gaps.

The reference has no session concept (its "last N games" windows are
rank-based), but any large-scale event/training-data pipeline needs
it, and it exercises the two canonical formulations:

- ``sessionize`` (batch): the lag/cumsum idiom — one window shuffle on
  the user key, no state, SQL-expressible (oracle-friendly):
  ``session_seq = Σ [gap > threshold] over (partition user order ts)``.
- ``sessionize_stream`` (streaming): the same semantics as a custom
  stateful operator via ``applyInPandasWithState`` — bounded state per
  user, emits sessions closed by the inactivity timeout. This is the
  shape Structured Streaming needs because rank/lag windows are not
  stream-computable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: Column | int = 1800,
    out_col: str = "session_seq",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Append a 0-based per-user session sequence number.

    ``ts_col`` must be numeric (epoch seconds/nanos — any unit, as
    long as ``gap`` is in the same unit); numeric timestamps keep the
    arithmetic engine-portable. One window shuffle on ``user_col``;
    the running sum is computed in the same window pass as the lag.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, (F.sum(is_new).over(running) - 1).cast("long"))


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``.

    State per user = (session start, last event, count), O(1) per
    active user. A batch's events extend the open session or close it
    and start a new one; closed sessions are emitted immediately. The
    trailing open session is flushed by an EVENT-TIME timeout: it
    fires when the watermark passes ``last + gap``, which is
    deterministic (data-driven) and — unlike a processing-time
    timeout — does not make ``availableNow`` catch-up runs loop empty
    micro-batches waiting for wall-clock time.

    ``ts_col`` must be a TimestampType column (the operator applies
    the watermark itself). Session bounds are emitted as epoch
    seconds.
    """
    ev = events.withWatermark(ts_col, watermark_delay)

    def _update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key

        def emit(start: int, last: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return
        ts = sorted(
            int(t)
            for pdf in pdfs
            for t in (pdf[ts_col].astype("int64") // 1_000_000_000).tolist()
        )
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        frames = []
        for t in ts:
            if t - last > gap_seconds and n > 0:
                frames.append(emit(start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        # flush the open session once event time moves past last + gap
        state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return ev.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
