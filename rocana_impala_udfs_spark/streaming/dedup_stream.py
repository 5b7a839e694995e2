"""Streaming deduplication and sessionization — the LLM-pipeline operators
made incremental.

- :func:`streaming_exact_dedup` — content-fingerprint dedup on an unbounded
  stream. ``dropDuplicatesWithinWatermark`` keeps state only for the
  watermark horizon, so state is bounded by (dup rate × horizon), the
  streaming analogue of the reference's bounded-aggregation-state doctrine.
- :func:`streaming_sessionize` — event-time session windows via the built-in
  ``F.session_window`` (gap-close semantics identical to the batch
  ``operators.temporal.sessionize`` boundaries); watermark bounds open-window
  state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.functions.text import doc_fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per content fingerprint within the watermark
    horizon. Input must be a streaming DataFrame with an event-time column."""
    with_fp = docs.withColumn("fingerprint", doc_fingerprint(text_col)).withWatermark(
        ts_col, watermark
    )
    return with_fp.dropDuplicatesWithinWatermark(["fingerprint"])


def streaming_sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key session windows (session closes after ``gap`` of inactivity):
    returns one row per closed session with start/end and event count."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
