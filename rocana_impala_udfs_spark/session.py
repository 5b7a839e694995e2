"""SparkSession factory tuned for this engine.

Scale notes (100 TB design, tested on local[N]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned partition counts.
- Arrow on: every pandas-UDF boundary (the reservoir aggregation, text
  analysis, embedding ops) moves data in columnar Arrow batches, not pickled
  rows.
- ``spark.sql.shuffle.partitions`` is only the *initial* value — AQE coalesces
  down; on a real cluster set it ≈ 2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rocana-impala-udfs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    # transformWithStateInPandas workers import google.protobuf; activate the
    # vendored shim (no-op if a real protobuf exists) BEFORE the JVM launches
    # so the PYTHONPATH it hands to spawned Python workers includes it.
    from rocana_impala_udfs_spark.vendor.pbshim import ensure_protobuf

    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Initial (pre-coalesce) shuffle partition count: AQE can only
        # coalesce DOWN — it never splits an un-skewed oversized partition
        # — so the INITIAL map granularity is what bounds per-block size
        # at scale. With it at the core count, the r13 100× sweep produced
        # multi-GB shuffle blocks whose single-buffer fetch OOM'd the heap
        # (self-join keys); 8× finer fixed that but cost +30-40% on
        # shuffle-heavy keys at sf0.1 (measured), so the DEFAULT targets
        # the sandbox's bench SF and scale runs raise it — the standard
        # Spark deployment rule (size initial partitions to data volume;
        # AQE adapts down). tools/scaling_sweep.py sets 8× at runtime;
        # production sets thousands.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INITIAL_PARTITIONS",
                str(shuffle_partitions or cpus),
            ),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver's events.parquet uses TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
