"""Stateful streaming anomaly detection: per-key running mean/variance
(Welford) maintained in `applyInPandasWithState`, flagging values whose
z-score against the PRE-batch statistics exceeds a threshold.

The batch-side companion is the catalog's ``hourly_anomalies``
(tumbling rollup ∘ z-score ladder); streams can't window over all
history, so the running-moments form is the stream-computable
equivalent: O(1) state per key (n, mean, M2), exact merge via Chan's
parallel update, no re-scan of history ever.

Semantics are deterministic per micro-batch: every value in a batch is
scored against the key's statistics as of the END of the previous
batch (so a batch's own outliers cannot mask each other), then the
batch is folded into the state in one Chan merge. The first
``min_count`` observations of a key are never flagged (no meaningful
variance yet).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, value double, zscore double, is_anomaly boolean, "
    "n_seen long"
)
_STATE_SCHEMA = "n long, mean double, m2 double"


def streaming_anomalies(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
    min_count: int = 10,
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Flag per-key outliers on a stream with bounded state.

    Null values are ignored (they would otherwise inflate n while
    pandas' skipna left them out of the moments — permanently biasing
    the state). A deviation from a perfectly FLAT baseline (zero
    variance after >= ``min_count`` observations) is always flagged
    with a null z-score: there is no finite z for sd=0, but a
    heartbeat metric that suddenly moves is the clearest anomaly
    there is. The key is emitted as a string (state operators need a
    fixed output schema; cast back as needed). The flag is computed
    on the 6-dp ROUNDED z so it always agrees with the emitted score.

    Scale shape: state is THREE numbers per distinct key regardless of
    stream length; each micro-batch does one pandas pass per key
    (vectorized numpy moments) plus one exact Chan merge into the
    state. No watermark needed — running statistics are
    order-insensitive within a batch by construction (the batch is
    folded as one aggregate). For high-cardinality keys pass
    ``state_ttl_ms`` to evict idle keys via a processing-time timeout
    (their statistics restart from zero if the key returns); the
    default keeps state forever.
    """

    def _update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        # reset_index: dropna leaves a gapped index, and the yielded
        # frame's list columns would misalign against it
        vals = (
            pd.concat(
                [pdf[value_col].astype("float64") for pdf in pdfs],
                ignore_index=True,
            )
            .dropna()
            .reset_index(drop=True)
        )
        if vals.empty:
            return
        if state.exists:
            n0, mean0, m2_0 = state.get
        else:
            n0, mean0, m2_0 = 0, 0.0, 0.0

        # score against PRE-batch statistics; flag on the ROUNDED z so
        # flag and emitted score always agree
        nb = int(len(vals))
        if n0 >= min_count and m2_0 > 0:
            std = math.sqrt(m2_0 / (n0 - 1))
            z = ((vals - mean0) / std).round(6)
            flagged = (z.abs() > threshold).fillna(False)
        elif n0 >= min_count:
            # flat baseline: any deviation is an anomaly (no finite z)
            z = pd.Series([float("nan")] * nb)
            flagged = vals != mean0
        else:
            z = pd.Series([float("nan")] * nb)
            flagged = pd.Series([False] * nb)

        # Chan's parallel merge: fold the whole batch into the state
        mean_b = float(vals.mean())
        m2_b = float(((vals - mean_b) ** 2).sum())
        n1 = n0 + nb
        delta = mean_b - mean0
        mean1 = mean0 + delta * nb / n1
        m2_1 = m2_0 + m2_b + delta * delta * n0 * nb / n1
        state.update((n1, mean1, m2_1))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

        yield pd.DataFrame(
            {
                "key": [str(k)] * nb,
                "value": vals,
                "zscore": z,
                "is_anomaly": flagged,
                "n_seen": [n0] * nb,
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
