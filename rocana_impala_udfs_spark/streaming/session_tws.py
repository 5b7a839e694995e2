"""Gap-based sessionization on ``transformWithStateInPandas`` EVENT-TIME
TIMERS — the tws protocol surface the value/list/map-state keys don't touch
(registerTimer / deleteTimer / handleExpiredTimer / TimerValues).

Semantics: per user, events belong to one session while consecutive gaps
stay ≤ ``gap``; a session CLOSES either inline (the next event of the same
user arrives with a larger gap) or by an event-time timer at
``last_ts + gap`` once the watermark passes it. Each closed session is
emitted exactly once. Sessions still open at the final watermark are never
emitted — the same append-mode finalization contract
``stream_hourly_append_watermark`` certifies for windowed aggregation.

Determinism on the ordered replay: file ranges are contiguous ts quantiles,
so no row is ever late for any positive delay (the r7 argument), inline
closes see per-user ts-monotone feeds, and the timer-closed tail is a
deterministic function of (data, gap, delay): a user's FINAL session is
emitted iff ``floor(last_us/1000) + gap_ms <= floor(max_us/1000) - delay_ms``
(Spark tracks watermarks at ms granularity). Input rows are processed
before expired timers within a batch (PROCESS_DATA before PROCESS_TIMER in
the tws worker), and every input batch re-points the user's single timer at
the new ``last + gap``, so a stale timer can never close a live session.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "user_id string, session_start_us bigint, session_end_us bigint, n_events bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def running_session_gap_tws(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 720,
    delay: str = "30 minutes",
) -> DataFrame:
    """Per-key gap sessionizer with event-time timers (see module doc)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60 * 1000
    gap_us = gap_ms * 1000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", STATE_SCHEMA)

        def _emit(self, key, s: int, l: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start_us": s,
                        "session_end_us": l,
                        "n_events": n,
                    }
                ]
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            s = l = None
            n = 0
            if self._state.exists():
                s, l, n = (int(x) for x in self._state.get())
                # one timer per key: re-pointed below after the batch folds in
                self._handle.deleteTimer(l // 1000 + gap_ms)
            pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts_us")
            for ts in pdf["ts_us"].astype("int64"):
                ts = int(ts)
                if s is None:
                    s, l, n = ts, ts, 1
                elif ts - l > gap_us:
                    yield self._emit(key, s, l, n)
                    s, l, n = ts, ts, 1
                else:
                    l, n = ts, n + 1
            self._state.update((s, l, n))
            self._handle.registerTimer(l // 1000 + gap_ms)

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            if not self._state.exists():
                return
            s, l, n = (int(x) for x in self._state.get())
            # only the CURRENT session's timer closes it; a stale timer for
            # an already-extended session was deleted on input, but guard
            # anyway (idempotent under replays)
            if expiredTimerInfo.getExpiryTimeInMs() >= l // 1000 + gap_ms:
                yield self._emit(key, s, l, n)
                self._state.clear()

        def close(self) -> None:
            pass

    return (
        events.filter(F.col(key_col).isNotNull())
        .withWatermark(ts_col, delay)
        .select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
        )
        .groupBy(key_col)
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
