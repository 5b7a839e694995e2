"""Structured Streaming tests: windowed median with watermark, and the
stateful reservoir median across micro-batches (bounded state)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.sources.io import load_table
from rocana_impala_udfs_spark.streaming.median_stream import (
    running_median_stream,
    windowed_median_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def event_stream_dir(spark):
    d = tempfile.mkdtemp(prefix="evstream_")
    load_table(spark, SF, "events").coalesce(2).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("update").start()
    q.processAllAvailable()
    q.stop()


def test_windowed_median_stream(spark, event_stream_dir):
    schema = load_table(spark, SF, "events").schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = windowed_median_stream(stream, window="1 day", watermark="2 days")
    q = out.writeStream.format("memory").queryName("win_median").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM win_median").collect()
    # Append mode only emits closed windows; with a static file source the
    # final watermark leaves the last window open, so compare a prefix.
    batch = load_table(spark, SF, "events")
    expect = (
        batch.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.percentile_approx("value", F.lit(0.5), F.lit(1000)).alias("median_value"))
        .count()
    )
    assert 0 < len(got) <= expect
    for r in got:
        assert r.n > 0 and r.median_value is not None


def test_running_median_stream_bounded_state(spark, event_stream_dir):
    schema = load_table(spark, SF, "events").schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = running_median_stream(stream, max_samples=5000)
    _run_stream(out, "run_median")
    got = {r.group: r for r in spark.sql("SELECT * FROM run_median").collect()}
    batch = load_table(spark, SF, "events")
    # max_samples=5000 > per-type row count at sf0.001 => exact upper median.
    from rocana_impala_udfs_spark.operators.reservoir import appx_median_bounded_agg

    expect = {
        r.event_type: r.median
        for r in appx_median_bounded_agg(batch, "value", 5000, ["event_type"]).collect()
    }
    assert set(got) == set(expect)
    for g, r in got.items():
        assert r.median == pytest.approx(expect[g], abs=1e-9)
        assert r.source_size == batch.filter(
            (F.col("event_type") == g) & F.col("value").isNotNull()
        ).count()
