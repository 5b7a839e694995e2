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


def md5_band_columns(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Per-ROW md5-string MinHash band hashes — LSH banding as pure column
    expressions (no aggregation), so a STREAMING pipeline can band each
    arriving document statelessly before a single stateful operator.

    Portability over speed: per-seed hashes are ``md5(seed || '|' ||
    shingle)`` hex STRINGS (lexicographic min == numeric min at fixed
    width), so a SQL oracle reproduces every hash exactly — unlike the
    batch operator's ``xxhash64`` path (`operators/dedup.py`), which is
    the throughput choice when cross-engine replay isn't needed. Higher-
    order-function lambdas evaluate interpreted per element (the r6 LSH
    lesson), so this shape is for ingest-rate streams, not corpus-wide
    backfills — the batch index (`sources/io.py:ensure_minhash_band_index`)
    remains the 100 TB bulk path.

    Returns (id, band_idx, band_hash) — one row per (doc, band); docs with
    fewer than ``k`` words are dropped (no shingles), matching the batch
    convention."""
    if num_hashes % bands:
        raise ValueError(f"bands {bands} must divide num_hashes {num_hashes}")
    rows_per_band = num_hashes // bands
    from rocana_impala_udfs_spark.functions.text import normalize_text

    words = F.split(normalize_text(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), n - k)
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
    def _minh(seed: int):
        return F.array_min(
            F.transform(
                F.col("_sh"), lambda x: F.md5(F.concat(F.lit(f"{seed}|"), x))
            )
        )

    with_sh = df.filter(n >= k).select(
        F.col(id_col).alias("id"), shingles.alias("_sh")
    )
    minhs = with_sh.select(
        "id", *[_minh(s).alias(f"h{s}") for s in range(num_hashes)]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return minhs.select(
        "id", F.explode(F.array(*band_cols)).alias("bh")
    ).select("id", "bh.band_idx", "bh.band_hash")


def running_lsh_index_tws(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """STREAMING LSH INDEX MAINTENANCE on ``transformWithStateInPandas``:
    documents are banded statelessly (:func:`md5_band_columns`), the stream
    groups by ``(band_idx, band_hash)``, and each bucket's member ids live
    in a typed ``ListState`` — every arrival emits candidate pairs against
    all prior members, then appends itself (``appendList``, O(new) state
    IO). This is the ingest-time half of incremental dedup: the batch
    probe (`dedup.incremental_minhash_pairs`) answers "dups of today's
    delta"; this answers "dups the moment each document lands".

    Emitted pairs are (dup_of < new_id) by doc-id arrival order; the same
    pair can surface from several bands — consumers (and the driver key)
    de-duplicate downstream, keeping the processor append-only.

    State grows with the indexed corpus (it IS the index). At 100 TB,
    bound each bucket (near-dup buckets saturate fast — cap + overflow
    marker) and TTL cold buckets; the full-history index belongs in the
    batch bucketed table."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    import pandas as pd
    from typing import Iterator

    class BucketProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ids = handle.getListState("ids", "id bigint")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prior = [int(i) for (i,) in self._ids.get()]
            incoming: list[int] = []
            for pdf in rows:
                incoming.extend(int(x) for x in pdf["id"])
            incoming.sort()
            out_new, out_old = [], []
            for nid in incoming:
                for old in prior:
                    out_new.append(nid)
                    out_old.append(old)
                prior.append(nid)
            self._ids.appendList([(i,) for i in incoming])
            if out_new:
                yield pd.DataFrame({"new_id": out_new, "dup_of": out_old})

        def close(self) -> None:
            pass

    banded = md5_band_columns(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, k=k,
    )
    return banded.groupBy("band_idx", "band_hash").transformWithStateInPandas(
        BucketProcessor(),
        outputStructType="new_id bigint, dup_of bigint",
        outputMode="Update",
        timeMode="None",
    )
