"""Stream-stream joins — the incremental analogue of the batch as-of /
range joins in ``operators/temporal.py``.

Structured Streaming's inner stream-stream join emits every match as soon
as both sides arrive; the watermarks plus the time-range predicate are what
BOUND the buffered state (each side can discard rows once the other side's
watermark passes the range), the same bounded-state doctrine as the
reference's aggregation design (median.h:27-29). Without the range
predicate the state would grow forever — which is why the operator requires
it rather than defaulting to an unconstrained equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to every click by the same user in the
    preceding ``max_delay`` — inner stream-stream interval join. Returns
    ``(user_id, click_id, purchase_id, click_ts, purchase_ts)``.

    Both inputs must be streaming DataFrames with event-time ``ts_col``.
    State per side is bounded by watermark + range: a buffered click can be
    dropped once the purchase-side watermark passes click_ts + max_delay.
    """
    c = (
        clicks.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col("event_id").alias("click_id"),
            F.col(ts_col).alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col(ts_col).alias("purchase_ts"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col(key_col))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_delay}")),
        "inner",
    ).select(key_col, "click_id", "purchase_id", "click_ts", "purchase_ts")
