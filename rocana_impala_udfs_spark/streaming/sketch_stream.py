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

import math
from typing import Any, Iterator, Tuple

import numpy as np
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
        # HALF_UP to match batch F.round / the oracle's round(): Python's
        # round() is banker's and can diverge on exact 5e-5 midpoints
        # (same fix class as the HLL kernel below).
        est4 = math.floor(est * 1e4 + 0.5) / 1e4
        yield pd.DataFrame(
            [{"group": key[0], "est_distinct": est4, "state_size": len(keep)}]
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


HLL_OUTPUT_SCHEMA = "group string, hll_distinct double, n_zero_regs int"
HLL_STATE_SCHEMA = "rhos array<int>"


def running_hll_distinct_stream(
    events: DataFrame,
    value_col: str = "user_id",
    group_col: str = "event_type",
    p: int = 10,
) -> DataFrame:
    """Running HLL distinct-count per group across micro-batches — the
    portable HyperLogLog (``operators/sketches.py:hll_registers``) with
    its register array persisted in the state store.  State is a dense
    ``m = 2^p`` int array per group, updated by element-wise max (the HLL
    merge monoid), so like the KMV stream the estimate after any number
    of micro-batches is a deterministic function of the SET of values
    seen — pinned equal to the batch sketch in tests/test_streaming.py.

    The register/rho derivation runs Spark-side (same md5 expressions as
    the batch operator) so the stateful kernel only takes elementwise
    maxima — vectorized per Arrow batch, never per row.
    """
    m = 1 << p
    rmax = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    shift = rmax

    def update_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            grouped = pdf.groupby("register")["rho"].max()
            for reg, rho in grouped.items():
                r = int(reg)
                if int(rho) > regs[r]:
                    regs[r] = int(rho)
        state.update((regs,))
        zeros = sum(1 for r in regs if r == 0)
        int_sum = sum(1 << (shift - r) for r in regs)
        raw = (alpha * m * m) / (int_sum / float(1 << shift))
        if raw <= 2.5 * m and zeros > 0:
            est = float(m) * math.log(float(m) / zeros)
        else:
            est = raw
        # HALF_UP to match batch F.round / the oracle's round(): Python's
        # round() is banker's and can diverge on exact 5e-5 midpoints.
        est4 = math.floor(est * 1e4 + 0.5) / 1e4
        yield pd.DataFrame(
            [{"group": key[0], "hll_distinct": est4, "n_zero_regs": zeros}]
        )

    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    w = F.shiftright(h, p)
    blen = F.length(F.bin(w))
    rho = F.when(w == 0, F.lit(rmax)).otherwise(F.lit(rmax) - blen)
    derived = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias(group_col),
        (h % m).cast("int").alias("register"),
        rho.cast("int").alias("rho"),
    )
    return derived.groupBy(group_col).applyInPandasWithState(
        update_fn,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BITMAP_OUTPUT_SCHEMA = "group string, n_distinct bigint, n_words int"
BITMAP_STATE_SCHEMA = "words array<bigint>, bits array<bigint>"


def running_bitmap_distinct_stream(
    events: DataFrame,
    value_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Running EXACT distinct count per group via 64-bit bitmap state —
    the streaming face of ``operators/sketches.py:bitmap_words``.  State
    is a sparse (word → bits) map persisted across micro-batches and
    merged by bitwise OR (the same monoid as the batch bit_or aggregate),
    so the running count is exact at O(universe/64) state per group —
    pinned equal to batch ``bitmap_cardinality`` in tests/test_streaming.py.

    Word/bit derivation runs Spark-side; the stateful kernel ORs
    per-batch word masks (one pass over a pre-aggregated pandas frame)."""

    def update_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        words: dict[int, int] = {}
        if state.exists:
            ws, bs = state.get
            words = {int(w): int(b) for w, b in zip(ws, bs)}
        for pdf in pdfs:
            # pre-OR the batch per word, vectorized, then merge into state
            batch = pdf.groupby("word")["bits"].apply(
                lambda s: int(np.bitwise_or.reduce(s.to_numpy(dtype=np.int64)))
            )
            for w, b in batch.items():
                words[int(w)] = words.get(int(w), 0) | int(b)
        state.update((list(words.keys()), list(words.values())))
        n = sum(int(v & ((1 << 64) - 1)).bit_count() for v in words.values())
        yield pd.DataFrame(
            [{"group": key[0], "n_distinct": n, "n_words": len(words)}]
        )

    derived = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias(group_col),
        F.expr(f"div({value_col}, 64)").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({value_col} % 64 AS INT))"
        ).alias("bits"),
    )
    return derived.groupBy(group_col).applyInPandasWithState(
        update_fn,
        outputStructType=BITMAP_OUTPUT_SCHEMA,
        stateStructType=BITMAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_bitmap_distinct_tws(
    events: DataFrame,
    value_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """The exact bitmap distinct-count on ``transformWithStateInPandas``
    with the sparse (word → bits) dictionary held in a typed ``MapState``
    — the state shape the API was designed for, and (r11) the key that
    exercises the MAP-state wire protocol (getMapState / containsKey /
    getValue / updateValue / iterator) end to end through the vendored
    protobuf runtime. Per-batch masks are pre-ORed vectorized; only
    TOUCHED words round-trip to the state store (point reads/writes),
    unlike the applyInPandasWithState twin which rewrites the whole
    dictionary every trigger — at a 100 TB universe that point-access
    pattern is the difference between O(touched) and O(universe/64) state
    IO per batch. Same OR-monoid, so values are pinned identical to
    ``running_bitmap_distinct_stream`` and the batch bitmap aggregate.

    Requires the RocksDB state-store provider and ``google.protobuf``
    (vendored shim suffices)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class BitmapMapStateProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._words = handle.getMapState("words", "word bigint", "bits bigint")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            merged: dict[int, int] = {}
            for pdf in rows:
                batch = pdf.groupby("word")["bits"].apply(
                    lambda s: int(np.bitwise_or.reduce(s.to_numpy(dtype=np.int64)))
                )
                for w, b in batch.items():
                    merged[int(w)] = merged.get(int(w), 0) | int(b)
            for w, b in merged.items():
                if self._words.containsKey((w,)):
                    b |= int(self._words.getValue((w,))[0])
                self._words.updateValue((w,), (b,))
            n = 0
            n_words = 0
            for _wk, wv in self._words.iterator():
                n_words += 1
                n += int(wv[0] & ((1 << 64) - 1)).bit_count()
            yield pd.DataFrame(
                [{"group": key[0], "n_distinct": n, "n_words": n_words}]
            )

        def close(self) -> None:
            pass

    derived = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias(group_col),
        F.expr(f"div({value_col}, 64)").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({value_col} % 64 AS INT))"
        ).alias("bits"),
    )
    return derived.groupBy(group_col).transformWithStateInPandas(
        BitmapMapStateProcessor(),
        outputStructType=BITMAP_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
