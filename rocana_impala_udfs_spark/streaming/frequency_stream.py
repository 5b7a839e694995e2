"""Streaming heavy-hitters — the Misra-Gries summary as persistent
streaming state (the batch operator is ``operators/frequency.py``).

The bounded-state doctrine the reference engineered for its reservoir
(``median.h:27-29``) applies verbatim: a Misra-Gries counter map is capped
at ``m`` entries per group no matter how many events arrive, so the state
store holds O(groups × m) forever — streaming-legal by construction, the
same property that makes the reservoir median streamable.

Semantics per trigger (update mode): the current candidate set with
Misra-Gries lower-bound counts. The classic guarantees carry over:
any value whose true running frequency exceeds N/m is guaranteed present,
and every emitted count undercounts by at most the total decrement
(≤ N/m). Counts are EXACT while a group's distinct-value count stays ≤ m
(no decrement has fired) — pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rocana_impala_udfs_spark.operators.frequency import _mg_reduce

STATE_SCHEMA = "vals array<string>, counts array<bigint>"
OUTPUT_SCHEMA = "group string, value string, mg_count bigint"


def streaming_heavy_hitters(
    events: DataFrame,
    value_col: str = "event_type",
    group_col: str | None = None,
    m: int = 100,
) -> DataFrame:
    """Running frequent-item summary per group across micro-batches.

    ``group_col=None`` tracks one global summary (key ``"all"``). Batches
    are absorbed vectorized (``value_counts`` per Arrow batch, never per
    row), then the counter map is shrunk back to ``m`` entries with the
    mergeable-summaries decrement — identical update rule to the batch
    ``misra_gries_candidates``, so batch and stream agree on guarantees.
    """

    def update_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        if state.exists:
            vals, counts = state.get
            counters = dict(zip(vals, (int(c) for c in counts)))
        for pdf in pdfs:
            for v, c in pdf["_v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            counters = _mg_reduce(counters, m)
        state.update((list(counters.keys()), [int(c) for c in counters.values()]))
        yield pd.DataFrame(
            {"group": key[0], "value": list(counters.keys()), "mg_count": list(counters.values())}
        )

    keyed = events.select(
        (F.col(group_col).cast("string") if group_col else F.lit("all")).alias("_g"),
        F.col(value_col).cast("string").alias("_v"),
    )
    return keyed.groupBy("_g").applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
