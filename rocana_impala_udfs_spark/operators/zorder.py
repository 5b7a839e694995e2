"""Z-order (Morton) multi-dimensional clustering for parquet layouts.

``write_clustered_parquet`` (sources/io.py) gives one column tight per-file
min/max stats; a filter on any *other* column still scans every file.
Z-ordering interleaves the bits of two (or more) key columns into a single
Morton code and range-clusters on *that*, so every clustered dimension gets
locality: files cover small axis-aligned rectangles of the key space and a
filter on either column skips most files via parquet footer stats. This is
the layout trick behind Delta/Iceberg ``ZORDER BY``, expressed with vanilla
Spark — the write is one ``repartitionByRange`` + sort, all JVM.

The Morton code itself is a pure column expression (bit shifts/masks, no
UDF) with a textually-generated SQL twin so DuckDB oracles reproduce it
bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.sources.io import write_clustered_parquet


def morton_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: bit b of
    ``x`` lands at position 2b, bit b of ``y`` at 2b+1."""
    terms = []
    for b in range(bits):
        xb = F.shiftright(x.cast("bigint"), b).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("bigint"), b).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(xb, 2 * b))
        terms.append(F.shiftleft(yb, 2 * b + 1))
    return reduce(lambda a, c: a + c, terms).cast("bigint")


def morton_sql_expr(x: str, y: str, bits: int = 8) -> str:
    """DuckDB SQL computing exactly :func:`morton_key` (same shift/mask
    terms, generated from the same loop so the two can't drift)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on the Morton interleave of two
    columns. Both columns then have file-level min/max locality — a filter
    on either one prunes files, not just the primary sort key.

    The transient ``_zorder`` column is dropped before writing; column
    values must be non-negative and fit in ``bits`` bits for full fidelity
    (values beyond that still write correctly but cluster only on their low
    bits — normalize/bucketize first, as Delta's ZORDER does internally).
    """
    keyed = df.withColumn("_zorder", morton_key(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(num_files, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )


__all__ = ["morton_key", "morton_sql_expr", "write_zorder_parquet", "write_clustered_parquet"]
