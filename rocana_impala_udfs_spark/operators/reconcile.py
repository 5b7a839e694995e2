"""Snapshot reconciliation: diff two versions of a keyed table.

The operational companion to the MERGE upsert (plans/relational.py): after
a backfill or incremental load, report what actually changed. One full
outer join on the key (a single shuffle per side — at 100 TB pre-bucket
both snapshots on the key and the join is exchange-free), with row
equality decided on md5 of the normalized compare columns so arbitrarily
wide rows cost one 32-byte comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(cols: list[str]) -> F.Column:
    # NULL-safe, unambiguous concatenation: length-prefix each value so
    # ("ab","c") never collides with ("a","bc"); NULL encodes distinctly.
    parts = []
    for c in cols:
        v = F.col(c).cast("string")
        parts.append(
            F.when(v.isNull(), F.lit("\x00")).otherwise(
                F.concat(F.length(v).cast("string"), F.lit(":"), v)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row diff status between two snapshots.

    Returns one row per key present in either side:
    ``*key_cols, status`` where status ∈ added | removed | changed |
    unchanged. ``compare_cols`` defaults to every shared non-key column.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, _row_hash(compare_cols).alias("_h_old"))
    n = new.select(*key_cols, _row_hash(compare_cols).alias("_h_new"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(*key_cols, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregated diff report: ``(status, n)`` ordered by status."""
    return (
        snapshot_diff(old, new, key_cols, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def cdc_latest(
    ops: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Collapse a change-data-capture batch to its latest row per key
    (latest-wins by ``seq_cols``), KEEPING tombstones — retaining the op
    column is what makes the state closed under composition:
    ``cdc_latest(latest(A) ∪ latest(B)) == cdc_latest(A ∪ B)`` whenever B's
    sequence numbers follow A's, so a persisted base state merges with each
    delta batch by union + re-collapse, no history rescan.  Latest-wins
    runs as ``max_by(row, struct(seq_cols))`` — a PARTIAL+FINAL aggregate
    (lexicographic struct max == the all-descending sort order), so a hot
    entity with millions of ops in one batch combines map-side instead of
    sorting inside a single key-partitioned window task; at scale the base
    state is the compacted table and only the delta pays the shuffle."""
    data_cols = [c for c in ops.columns]
    return (
        ops.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in data_cols]),
                F.struct(*[F.col(c) for c in seq_cols]),
            ).alias("_r")
        )
        .select("_r.*")
    )


def cdc_apply(
    base_state: DataFrame,
    delta_ops: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC delta batch to a persisted base state: collapse the
    delta, union with the base, re-collapse, then drop tombstones — the
    MERGE-INTO/compaction step of a lakehouse ingest pipeline.  The result
    equals a full recompute over the entire history (the maintenance
    identity the oracle checks)."""
    merged = cdc_latest(base_state.unionByName(cdc_latest(delta_ops, key_cols, seq_cols)), key_cols, seq_cols)
    return merged.filter(F.col(op_col) != F.lit(delete_op))
