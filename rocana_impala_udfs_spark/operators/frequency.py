"""Frequency / heavy-hitter operators for corpus statistics at scale.

The reference delegates all aggregation to its host engine (SURVEY §2.2);
its own contribution is the bounded-state partial+final protocol
(median.cc:128-282). ``heavy_hitters`` applies that same bounded-state
design to frequent-item mining: a Misra-Gries summary per partition
(bounded memory, one pass, no shuffle) proposes candidates, then an exact
recount restricted to the candidate set produces EXACTLY the items with
count >= threshold — the approximation never reaches the output, as with
the MinHash-verify pattern in ``operators/dedup.py``.

Why this shape at 100 TB: the naive ``groupBy(value).count()`` shuffles
one record per distinct value (the whole vocabulary). Phase 1 caps
map-side output at ``m`` candidate values per partition, so the shuffle is
O(partitions x m) regardless of vocabulary size; phase 2's recount is a
broadcast semi-join + a map-side-combined count of only candidate rows.
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict, m: int) -> dict:
    """Shrink an over-full counter map back to <= m entries by subtracting
    the (m+1)-th largest count from every entry (the batch/mergeable form of
    the Misra-Gries decrement — Agarwal et al., "Mergeable Summaries")."""
    if len(counters) <= m:
        return counters
    t = heapq.nlargest(m + 1, counters.values())[-1]
    return {v: c - t for v, c in counters.items() if c > t}


def misra_gries_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    """One bounded-memory frequency summary per partition; emits <= m
    candidate values per partition, guaranteed to include every value whose
    GLOBAL count exceeds N/m (pigeonhole over the per-partition guarantee).
    No shuffle: pure mapInPandas over the existing partitioning."""
    value_schema = df.select(col).schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # Vectorized per unique value in the Arrow batch, not per row.
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            counters = _mg_reduce(counters, m)
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, schema=value_schema)


def heavy_hitters(df: DataFrame, col: str, min_frac: float) -> DataFrame:
    """Exactly the values of ``col`` occurring in >= ``min_frac`` of rows,
    with their exact counts — equivalent to
    ``GROUP BY col HAVING count(*) >= ceil(min_frac * N)`` but with shuffle
    bounded by the candidate set instead of the vocabulary.

    Exactness: summary width m = ceil(2/min_frac) makes the phase-1 miss
    threshold N/m <= N*min_frac/2 strictly below the recount threshold, so
    no qualifying value can be missed; the recount makes counts exact.
    """
    if not 0 < min_frac <= 1:
        raise ValueError("min_frac must be in (0, 1]")
    m = math.ceil(2.0 / min_frac)
    total = df.count()
    min_count = math.ceil(min_frac * total)
    cands = misra_gries_candidates(df, col, m).distinct()
    return (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
