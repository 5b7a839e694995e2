"""Declarative data-quality checks over keyed tables.

An ops engine ingesting 100 TB/day needs cheap, continuous integrity
reporting. Each check compiles to a small aggregate plan (count of
violating rows — never the rows themselves), and the report is the union
of one 1-row frame per check, so the whole suite is a handful of
partial+final aggregations:

- ``not_null`` — violations = rows with NULL in the column
- ``unique`` — violations = rows beyond the first per key (count - distinct)
- ``in_range`` — violations = rows outside [lo, hi]
- ``references`` — violations = child rows whose key misses the parent
  (left-anti join; broadcast when the parent side is dim-sized)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("violations")
    ).select(F.lit(name or f"not_null:{col}").alias("check"), "violations")


def unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    label = name or f"unique:{','.join(cols)}"
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])).alias("violations")
    ).select(F.lit(label).alias("check"), "violations")


def in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    label = name or f"in_range:{col}"
    bad = F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
    return df.agg(F.count(F.when(bad, 1)).alias("violations")).select(
        F.lit(label).alias("check"), "violations"
    )


def references(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    label = name or f"references:{child_key}->{parent_key}"
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    # NULL child keys are excluded: a NULL is a not_null violation, not a
    # referential one — and this matches SQL `key NOT IN (SELECT ...)`
    # semantics (NULL key yields UNKNOWN, never counted), so the operator
    # and a NOT IN oracle agree even on corpora with NULL keys.
    orphans = child.filter(F.col(child_key).isNotNull()).join(p, child_key, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(label).alias("check"), "violations"
    )


def quality_report(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row check frames into ``(check, violations)``, ordered."""
    return reduce(lambda a, b: a.unionByName(b), checks).orderBy("check")
