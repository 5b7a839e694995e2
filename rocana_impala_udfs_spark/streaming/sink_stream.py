"""Streaming sinks via ``foreachBatch`` — restart-safe batch-writer bridge.

``foreachBatch`` hands each micro-batch to ordinary DataFrame-writer code,
which is how Structured Streaming reaches every batch sink (parquet tables,
JDBC, MERGE targets) that has no native streaming writer. Exactly-once
hinges on making the per-batch write IDEMPOTENT: here a complete-mode
aggregate overwrites one snapshot location per batch, so replaying a batch
after restart converges to the same state instead of duplicating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def snapshot_parquet_sink(agg: DataFrame, path: str, checkpoint: str):
    """Write a complete-mode streaming aggregate as an atomically-replaced
    parquet snapshot per micro-batch. Returns the started query.

    Idempotence: ``overwrite`` makes a replayed batch rewrite the identical
    snapshot; the checkpoint tracks source offsets, so restart resumes
    instead of reprocessing history.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(path)

    return (
        agg.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .start()
    )
