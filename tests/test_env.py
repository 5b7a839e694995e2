"""Environment-drift canary (VERDICT r3 item 5).

Round 3's failure mode: the sandbox silently upgraded to Spark 4.1.2, which
reads INT64 TIMESTAMP(NANOS) parquet natively as TIMESTAMP_NTZ and broke 8
temporal queries at plan time. This module fails loudly, in seconds, when the
runtime shifts underneath the repo again:

- ``events.ts`` must normalize to TIMESTAMP (LTZ) through ``load_table`` —
  the contract every temporal plan (RANGE frames, ``unix_micros``) relies on,
  mirroring the reference's timestamp ordering semantics (median.cc:216-221).
- one cheap 1-row query per plan family, so a regression names its family
  instead of crashing the driver bench mid-run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from rocana_impala_udfs_spark.sources.io import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_events_ts_is_timestamp_ltz(spark):
    ts_type = load_table(spark, SF_SMOKE, "events").schema["ts"].dataType
    assert isinstance(ts_type, TimestampType), (
        f"events.ts loaded as {ts_type}; temporal plans require TIMESTAMP "
        "(LTZ). A Spark upgrade likely changed parquet TIMESTAMP(NANOS) "
        "handling — extend load_table's normalization (sources/io.py)."
    )


@pytest.mark.parametrize(
    "key",
    [
        "appx_median_price_global",  # medians (reference core)
        "q1_pricing_summary",  # relational
        "tumbling_hourly_event_stats",  # temporal (the r3 breakage family)
        "sessionize_events",  # temporal, sessionize gap math
        "conditional_q14_promo_share",  # tpch
        "dedup_exact_docs",  # pipeline
        "ewma_user_value",  # stateful fold (applyInPandas)
        "multimodal_jpeg_decode_stats",  # Arrow codec kernels
    ],
)
def test_one_query_per_family_plans_and_runs(spark, key):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[key](spark, SF_SMOKE)
    # .limit(1).collect() exercises plan analysis + one task per stage cheaply.
    df.limit(1).collect()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_documents_corpus_is_pure_ascii(spark, sf_dir):
    """The multimodal oracles assume 1 char == 1 byte == 1 codepoint: the
    '[^ -~]' sanitize regex runs over Java regex semantics in Spark but
    Unicode codepoints in DuckDB, and an astral-plane character (outside
    the BMP) could map to a different number of 'x's per engine. The
    synthetic corpora are pure ASCII, which makes the engines agree — this
    test pins that assumption so a corpus change fails loudly here instead
    of as a value-hash mismatch in a multimodal key."""
    n_non_ascii = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("[^\\x00-\\x7F]"))
        .count()
    )
    assert n_non_ascii == 0
