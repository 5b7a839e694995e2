"""Dataset splitting and sampling for training pipelines.

- :func:`hash_split` — deterministic, content-stable train/val/test
  assignment: bucket = first 4 hex chars of md5(key) mod 100. The split is a
  pure projection (no shuffle, no state, no seed file); any engine — Spark,
  DuckDB, a future backfill job — assigns every row identically, which is
  the property that keeps splits stable across reprocessing runs at any
  scale. (Spark's xxhash64/rand would be faster per-row but are not
  reproducible outside Spark.)
- :func:`stratified_sample` — per-stratum Bernoulli sampling via
  ``DataFrame.sampleBy``: seeded, single pass, no shuffle; fractions chosen
  per key (e.g. downsample the majority class). Sampling is probabilistic —
  exact-count guarantees need a rank-and-filter window instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key: Column) -> Column:
    """Stable bucket 0..99 from any key column (content-addressed)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("bigint") % 100


def hash_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Adds a ``split`` column: 'train' | 'val' | 'test' by stable hash
    bucket of ``key_col`` (train_pct / val_pct / remainder)."""
    b = split_bucket(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample; strata absent from ``fractions`` are
    dropped (fraction 0), matching ``sampleBy`` semantics."""
    return df.sampleBy(stratum_col, fractions, seed)


def weighted_sample(
    df, weight_col: str, k: int, seed: int = 42
):
    """A-Res weighted reservoir sample of ``k`` rows: inclusion probability
    proportional to ``weight_col``. This is the reference's own merge
    mechanism promoted to a user-facing operator — its serialize phase
    assigns each sample the key ``(source_size - r)/source_size`` so larger
    partials win merges proportionally (median.cc:176-192); A-Res
    (Efraimidis-Spirakis) is the principled form: key = u^(1/w), keep the
    top-k keys.

    Fully JVM and one pass: per-row key via ``pow(rand(seed), 1/w)``, then
    global top-k = ``TakeOrderedAndProject`` (per-partition heaps + driver
    merge of k candidates per partition — never a full sort). Rows with
    non-positive weight are excluded, matching w→0 ⇒ key→0.
    """
    from pyspark.sql import functions as F

    w = F.col(weight_col).cast("double")
    keyed = df.filter(w > 0).withColumn("_ares_key", F.pow(F.rand(seed), 1.0 / w))
    return keyed.orderBy(F.col("_ares_key").desc()).limit(k).drop("_ares_key")


def weighted_hash_gate(
    df: DataFrame,
    weight: Column,
    key_col: str,
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted (importance) sampling: keep a row iff its
    content-addressed uniform draw u = md5-bucket(key)/precision falls
    below ``weight`` (a [0,1] column, e.g. a quality score). The same
    content-stable-hash trick as :func:`hash_split` lifted from fixed
    percentages to per-row weights — reproducible in any engine (it IS the
    RNG), pure projection, no shuffle, no seed state. The keep rate of a
    large corpus converges to avg(weight)."""
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast("bigint")
        % precision
    ) / F.lit(float(precision))
    return df.withColumn("_u", u).filter(F.col("_u") < weight).drop("_u")


def stratified_hash_gate(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its content-
    addressed integer draw (md5-bucket of ``key_col``) is below the
    stratum's integer threshold. Unlike seeded ``sampleBy`` the decision is
    a pure projection reproducible in ANY engine (the hash IS the RNG), so
    it is exactly oracle-checkable AND stable across reprocessing — the
    property that matters when a 100-TB corpus is resampled incrementally.
    Strata absent from ``fractions`` are dropped (gate 0), matching
    ``sampleBy``. The draw-vs-threshold compare is integer-only: no float
    boundary can flip a row between engines."""
    draw = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast("bigint")
        % precision
    )
    gate = F.lit(0)
    for stratum, frac in sorted(fractions.items()):
        gate = F.when(F.col(stratum_col) == stratum, int(frac * precision)).otherwise(gate)
    return df.filter(draw < gate)


def weighted_sample_deterministic(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    precision: int = 1_000_000,
) -> DataFrame:
    """A-Res weighted top-k with the content-addressed draw as the RNG:
    key = u^(1/w) with u = md5-bucket(key_col)/precision, keep the k
    largest keys (ties broken by ``key_col`` — the key is rounded to 9
    decimals in both engines so a sub-ulp libm difference in ``pow`` cannot
    reorder the boundary). Same single-pass TakeOrdered plan as
    :func:`weighted_sample`, but reproducible outside Spark and therefore
    exactly oracle-checkable."""
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast("bigint")
        % precision
    ) / F.lit(float(precision))
    keyed = df.filter(w > 0).withColumn("_ares_key", F.round(F.pow(u, 1.0 / w), 9))
    return keyed.orderBy(F.col("_ares_key").desc(), F.col(key_col)).limit(k)
