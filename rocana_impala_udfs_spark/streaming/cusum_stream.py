"""Streaming CUSUM drift detection — the batch ``cusum_fold``
(operators/temporal.py) carried across micro-batches with
``applyInPandasWithState``.

State per key is exactly ``(s, n)`` — O(1) forever: the one-sided CUSUM
recursion s_t = max(0, s_{t-1} + (x_t - target)) needs only its last value.
The ``target`` is a fixed reference level supplied by the caller (in
production: the key's historical baseline, refreshed out-of-band) — a
streaming operator cannot peek at the full-stream mean the batch query
derives, and alerting contracts pin the baseline anyway.  Rows fold in
(ts, tiebreak) order within each micro-batch; equivalence with the batch
fold holds when per-key event time is non-decreasing across batches (the
usual replay/ingest contract).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "acc double, n bigint"


def output_schema(key_col: str = "event_type") -> str:
    return f"{key_col} string, cusum double, n_events bigint"


def running_cusum_stream(
    events: DataFrame,
    target: float,
    key_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running one-sided CUSUM across micro-batches (update mode)."""

    def update_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc = 0.0
        n = 0
        if state.exists:
            acc, n = state.get
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, order_tiebreak], kind="mergesort")
        for x in rows[value_col].astype(float):
            acc = max(0.0, acc + (x - target))
            n += 1
        state.update((float(acc), n))
        yield pd.DataFrame([{key_col: key[0], "cusum": acc, "n_events": n}])

    return (
        events.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(order_tiebreak),
            F.col(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=output_schema(key_col),
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
