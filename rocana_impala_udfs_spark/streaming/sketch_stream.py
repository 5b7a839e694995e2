"""Streaming KMV distinct-count — the mergeable sketch made incremental.

The batch sketch (``operators/sketches.py``) keeps the k smallest distinct
hashes per group; here that same bounded state is persisted by Spark's
state store across micro-batches via ``applyInPandasWithState``: each
trigger unions the batch's hashes into the state, re-truncates to k, and
emits the current estimate. State is O(groups × k) forever — the same
bounded-state contract as the reference's reservoir UDA
(``median.h:27-29``) and the streaming analogue of ``kmv_merge``.

Exactness property (pinned in tests/test_streaming.py): because KMV state
is a *deterministic function of the set of values seen*, the streaming
estimate after any number of micro-batches equals the batch estimate over
the union of those batches — no order sensitivity, unlike sampling-based
state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rocana_impala_udfs_spark.operators.sketches import kmv_hash

OUTPUT_SCHEMA = "group string, est_distinct double, state_size bigint"
STATE_SCHEMA = "hashes array<double>"


def running_kmv_distinct_stream(
    events: DataFrame,
    value_col: str = "user_id",
    group_col: str = "event_type",
    k: int = 256,
) -> DataFrame:
    """Running approximate distinct-count per group across micro-batches."""

    def update_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(h for h in pdf["h"].tolist() if h is not None)
        keep = sorted(seen)[:k]
        state.update((keep,))
        est = float(len(keep)) if len(keep) < k else (k - 1) / keep[-1]
        yield pd.DataFrame(
            [{"group": key[0], "est_distinct": round(est, 4), "state_size": len(keep)}]
        )

    hashed = events.select(
        F.col(group_col).cast("string").alias(group_col),
        kmv_hash(F.col(value_col)).alias("h"),
    )
    return hashed.groupBy(group_col).applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
