"""Skyline (Pareto-optimal set) operator.

Spark has no native skyline; the standard distributed formulation (cf.
"Integration of Skyline Queries into Spark SQL", EDBT 2023 — PAPERS.md)
exploits that skyline is *distributive*:

    skyline(P) = skyline( skyline(P₁) ∪ … ∪ skyline(Pₙ) )

Phase 1 computes a local skyline per partition (``mapInPandas``, vectorized
dominance check per Arrow batch group); phase 2 coalesces the surviving
points — typically orders of magnitude fewer than the input — and runs the
same kernel once more. Shuffle volume is O(|local skylines|), never O(n).

A point is dominated iff another point is ≤ in every criterion and < in at
least one (after normalizing 'max' criteria by negation). Duplicates on all
criteria don't dominate each other — both survive, matching the SQL
``NOT EXISTS`` formulation used as the oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _skyline_mask(M: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for the minimize-all skyline of row matrix M.

    Vectorized O(n²) dominance test — fine for per-partition batches; the
    global phase only ever sees already-thinned points.
    """
    n = len(M)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            continue
        le = (M <= M[i]).all(axis=1)
        lt = (M < M[i]).any(axis=1)
        dominators = le & lt
        if dominators.any():
            keep[i] = False
    return keep


def _estimate_fan_in(df: DataFrame) -> int:
    """Partition count feeding ``df``'s final stage, WITHOUT running a job.

    Shuffle-fed: the TOPMOST (first-listed) Exchange node's explicit
    partition count (``RoundRobinPartitioning(32)``, ``hashpartitioning(x,
    200)`` — the trailing integer), read from the unexecuted plan string.
    Topmost, not max: the plan string prints the final stage first, so the
    first Exchange is the one actually feeding this operator — taking the
    max over ALL Exchanges would let an upstream 200-partition shuffle
    under a later ``coalesce(2)`` report parts=200 and force a needless
    extra tree level (ADVICE r12 #4).  Exchange-free:
    ``rdd.getNumPartitions()``, which creates no query stages and submits
    no job when there is nothing to shuffle.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" not in line or "BroadcastExchange" in line:
            continue
        if "SinglePartition" in line:
            return 1
        if "artitioning(" in line:
            # partition count is the LAST integer argument of the
            # partitioning: RoundRobinPartitioning(32),
            # hashpartitioning(coalesce(x#1, 0), 32), rangepartitioning(...)
            nums = re.findall(r"[(,] ?(\d+)\)", line)
            if nums:
                return int(nums[-1])
        # The TOPMOST non-broadcast Exchange is the one feeding this
        # operator; if its count cannot be parsed, do NOT keep scanning —
        # a later match would be an UPSTREAM exchange whose count silently
        # reintroduces the over-count the topmost-only rule exists to
        # prevent (ADVICE r13 #2). Return the session's configured shuffle
        # partition count instead: it is what an un-annotated Exchange
        # defaults to, it is read job-free (``.rdd`` on a SHUFFLE-FED frame
        # would materialize the upstream map stages — the r12 review trap),
        # and an overestimate only risks one cheap extra tree level.
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.rdd.getNumPartitions()


def skyline(df: DataFrame, criteria: list[tuple[str, str]]) -> DataFrame:
    """Pareto-optimal rows of ``df`` under ``criteria`` =
    [(column, 'min'|'max'), ...]. Returns the full input rows that survive.
    """
    cols = [c for c, _ in criteria]
    signs = np.array([1.0 if d == "min" else -1.0 for _, d in criteria])
    out_schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        M = pdf[cols].to_numpy(dtype=np.float64) * signs
        yield pdf[_skyline_mask(M)]

    thinned = df.mapInPandas(local, schema=out_schema)
    # Global phase as a TWO-LEVEL tree reduction: the sum of local skylines
    # can still be large when criteria dimensionality grows (survivor count
    # rises steeply with dimensions), so instead of coalescing everything
    # onto one task, first thin again at ~√P fan-in, then once more on the
    # doubly-thinned remainder. Each level applies the same distributive
    # identity skyline(P) = skyline(∪ skyline(Pᵢ)); coalesce moves no data
    # between executors beyond task grouping (no shuffle exchange).
    #
    # The mid level only pays when it REDUCES fan-in: with P local-skyline
    # partitions the final task merges P streams without it and `mid`
    # streams with it, so unless P meaningfully exceeds mid the extra
    # Arrow/Python stage is pure fixed cost (~0.3 s measured at sf0.1,
    # where a small scan yields P ≤ 2 — the r11 `skyline_parts` drift).
    #
    # Estimating P must not run a job (r12 review: `.rdd` on a SHUFFLE-FED
    # frame materializes the upstream map stages under AQE — the subplan
    # would execute twice per call). Exchange-fed plans carry their target
    # partition count in the unexecuted plan text (AQE may coalesce lower
    # at runtime — an overestimate only risks one cheap extra tree level,
    # and at real scale shuffle fan-in genuinely is the configured count);
    # exchange-free plans (file scans, parallelized/local relations) have
    # no query stages, so getNumPartitions there is plan-side, measured
    # job-free.
    parts = _estimate_fan_in(thinned)
    mid = max(int(parts**0.5), 2)
    if parts > 2 * mid:
        thinned = thinned.coalesce(mid).mapInPandas(local, schema=out_schema)
    return thinned.coalesce(1).mapInPandas(local, schema=out_schema)
