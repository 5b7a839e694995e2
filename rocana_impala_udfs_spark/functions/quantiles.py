"""Conf-switchable quantile aggregate (VERDICT r3 item 4).

The reference's whole point is BOUNDED aggregation state (median.h:27-29:
``appx_median_bounded`` caps reservoir memory). Spark's exact ``percentile``
aggregate buffers every value of the group in one agg state — bit-exact and
oracle-checkable at test scale, but a memory bomb on a 100-TB fact column.
``percentile_approx`` (Greenwald-Khanna QuantileSummaries) keeps bounded
state with rank error ≤ 1/accuracy at the same plan shape.

``quantile_agg`` lets deployments pick per-session:

- default: exact ``percentile`` (driver-oracle parity)
- ``spark.conf.set("spark.rocana.quantile.approx", "true")``: bounded-state
  ``percentile_approx`` with accuracy from ``spark.rocana.quantile.accuracy``
  (default 10000 → rank error ≤ 0.01%)

Results are cast to DOUBLE (or array<double>) on both paths so the output
schema never depends on the conf.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

APPROX_CONF = "spark.rocana.quantile.approx"
ACCURACY_CONF = "spark.rocana.quantile.accuracy"


def approx_enabled(spark: SparkSession) -> bool:
    return str(spark.conf.get(APPROX_CONF, "false")).lower() == "true"


def quantile_agg(spark: SparkSession, col: str, probs: float | Sequence[float]) -> Column:
    """Aggregate expression for quantile(s) of ``col``.

    ``probs`` may be one probability or a sequence; output is DOUBLE /
    array<double> respectively, identical on the exact and approx paths.
    """
    if isinstance(probs, (list, tuple)):
        p_sql = f"array({','.join(map(str, probs))})"
        out_type = "array<double>"
    else:
        p_sql = str(probs)
        out_type = "double"
    if approx_enabled(spark):
        acc = int(spark.conf.get(ACCURACY_CONF, "10000"))
        return F.expr(f"cast(percentile_approx({col}, {p_sql}, {acc}) as {out_type})")
    return F.expr(f"cast(percentile({col}, {p_sql}) as {out_type})")
