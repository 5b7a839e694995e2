"""Two-phase (salted) grouped top-k — the 100 TB-correct per-group rank.

The textbook per-group top-k is a rank window partitioned by the group
key; its physical plan sorts EVERY group in one task, so a single hot
group (a celebrity user, a head query) becomes one giant straggler
partition at scale. Top-k is a mergeable aggregate, so the scalable plan
is the same partial/final split every sum enjoys:

- phase 1: rank within ``(group, salt)`` where ``salt = pmod(hash(row),
  S)`` — every sorted run is bounded to ~1/S of the group — and keep the
  local top-k;
- phase 2: rank the surviving ≤ S·k rows per group and keep the global
  top-k. Correct because the global top-k of a union is contained in the
  union of per-part top-k's (the merge property); EXACT for any total
  order, made deterministic here by a tiebreaker column.

This is the grouped analog of sort-limit's TakeOrderedAndProject
(SURVEY §4.1) and the pattern the ANN keys' per-probe rank windows adopt
at real scale. Same result as the plain window (oracle-identical); the
plan trades one unbounded sort for two bounded ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk_two_phase(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: Column,
    salts: int = 8,
) -> DataFrame:
    """Top-``k`` rows per group under ``order_cols`` (must be a total
    order — include a tiebreaker), with both ranking passes bounded:
    phase-1 partitions carry ~1/``salts`` of a group, phase-2 carries at
    most ``salts * k`` rows per group. Output = input columns + ``rk``."""
    if k <= 0 or salts <= 0:
        raise ValueError(f"k and salts must be positive, got k={k} salts={salts}")
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(salts)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
