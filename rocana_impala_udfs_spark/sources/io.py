"""Parquet/CSV/JSON source helpers for the driver star schema (TESTDATA.md).

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning, and partition pruning (SURVEY §2.2 "Scans"). Writers are thin
``df.write`` wrappers; at 100 TB prefer partitioned parquet with
``maxRecordsPerFile`` and sorted-within-partition layout for downstream
pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-(session, table, corpus-plan) band-index fingerprint memo — see
# ensure_minhash_band_index
_BAND_INDEX_FP_MEMO: dict = {}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, uniform_reduce_keys: bool = False
) -> DataFrame:
    # Every query's scan volume flows through here, so this is where the
    # engine sizes AQE's initial (pre-coalesce) shuffle partition count to
    # the data actually being read (VERDICT r13 #1: the 100× shuffle-block
    # OOM fix as a self-acting default, not an env knob). Sticky-max per
    # session (ADVICE r14 #1): Spark reads the conf at EXECUTION time, so
    # a lazily-built big-dir frame keeps its sizing even if a smaller dir
    # is loaded before it executes; session.reset_autosize is the explicit
    # epoch boundary. Runtime-settable conf; memoized dir walk; no-op when
    # the operator overrides via env. uniform_reduce_keys=True is the
    # caller's declaration that EVERY shuffle in the query it is building
    # keys on (near-)uniform keys, admitting the 16×-coarser skew-aware
    # sizing tier (VERDICT r14 #2 — see session.py for the calibration).
    from rocana_impala_udfs_spark.session import autosize_initial_partitions

    autosize_initial_partitions(spark, sf_dir, uniform_reduce_keys=uniform_reduce_keys)
    # events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark rejects
    # unless nanosAsLong is on. Set it here (runtime-settable) so the loader
    # works under ANY session, not just ones built by our get_spark.
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nano-precision parquet timestamps surface as BIGINT nanos under
    # spark.sql.legacy.parquet.nanosAsLong; normalize to TIMESTAMP (micros,
    # truncating like DuckDB does) so downstream plans see one type.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Spark 4.1+ reads INT64 TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ (no
    # nanosAsLong needed). Normalize to TIMESTAMP_LTZ: the session tz is UTC,
    # so epoch semantics match DuckDB exactly (same micros truncation), and
    # downstream unix_micros()/RANGE-frame plans keep working.
    if name == "events" and isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session parallelism target when the
    scan arrived NARROW (r16 optimization round, guide §2.5 "input skew"):
    the fixture tables are single-file/single-row-group parquet, so every
    scan is ONE partition and any compute-heavy map-side chain on it
    serializes (the Poisson-bootstrap keys' 3M-md5 projection measured
    4.5 s in one task at sf0.1 — ~0.15 s spread over 32). At 100 TB the
    scan is already wide and this is a no-op — same contract as the
    private helpers in operators/{dedup,skyline,multimodal}.py and
    functions/text.py."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the cluster
    column + ``sortWithinPartitions`` before writing, so each output file
    covers a narrow, (near-)disjoint range of the column. Parquet footers
    then carry tight min/max stats per file/row-group and a filtered scan
    skips most of the data — the layout optimization that decides scan cost
    at 100 TB (the same idea as Delta/Iceberg ordered writes, expressed
    with vanilla Spark).

    Range partitioning samples the column to build balanced boundaries, so
    skewed cluster keys still give even file sizes.
    """
    w = (
        df.repartitionByRange(num_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bloom_parquet(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Parquet with column BLOOM FILTERS in the footers (native parquet-mr
    feature, per-column opt-in): point-lookup predicates on high-cardinality
    columns (ids, fingerprints) skip row groups even where min/max stats
    can't — the complement of range clustering for needle-in-haystack scans
    at 100 TB.  ``ndv`` sizes each filter for the expected distinct count
    per row group (over-sizing costs footer bytes, under-sizing costs FPR).
    ``tests/test_io.py`` verifies the filters land in the real footers and
    prune row groups on a miss."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
    w.parquet(path)


def retire_orphan_location(spark: SparkSession, table: str) -> None:
    """Retire a CATALOG-UNKNOWN warehouse directory left by a dead session
    so ``saveAsTable`` doesn't die with LOCATION_ALREADY_EXISTS (the
    in-memory catalog forgets tables whose managed directories survive on
    disk).  ATOMIC RENAME to a unique ``.stale-*`` sibling before deletion
    (ADVICE r10 #2): two sessions sharing one warehouse can race here, and
    rename-then-delete means the loser gets a clean miss instead of
    reading a half-deleted directory; the target is also asserted to live
    INSIDE the session warehouse before anything is removed."""
    import shutil
    import uuid
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    wh_path = os.path.realpath(urlparse(warehouse).path)
    loc = os.path.realpath(os.path.join(wh_path, table.lower()))
    if not os.path.isdir(loc):
        return
    # never delete outside the warehouse, whatever the table name
    # decodes to (ValueError, not assert: asserts vanish under -O)
    if not loc.startswith(wh_path + os.sep):
        raise ValueError(f"refusing to retire {loc}: outside warehouse {wh_path}")
    retired = f"{loc}.stale-{uuid.uuid4().hex[:12]}"
    try:
        os.rename(loc, retired)  # atomic: concurrent readers keep their dir
    except OSError:
        return  # another session already retired it
    shutil.rmtree(retired, ignore_errors=True)


def orc_roundtrip_table(spark: SparkSession, df: DataFrame, table: str) -> DataFrame:
    """Write ``df`` as a managed ORC table and return the read-back frame.

    ORC is Spark's second built-in columnar format (JVM-native vectorized
    reader, predicate pushdown and column pruning into the scan, zstd
    compression) — the interchange surface for Hive-era warehouses the
    way parquet is for lakehouses.  Overwrite-per-call: the write is a
    distributed columnar encode, the read a fresh scan, so a caller that
    aggregates the result exercises the full encode→decode fidelity of
    every column type it selects.  The orphaned-location retirement is the
    same safety discipline as :func:`ensure_minhash_band_index`."""
    if not spark.catalog.tableExists(table):
        retire_orphan_location(spark, table)
    (
        df.write.mode("overwrite")
        .format("orc")
        .option("compression", "zstd")
        .saveAsTable(table)
    )
    return spark.table(table)


def ensure_minhash_band_index(
    spark: SparkSession,
    corpus: DataFrame,
    table: str,
    buckets: int = 16,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    banding=None,
) -> DataFrame:
    """The standing LSH band index as a FIRST-CLASS persisted artifact:
    build ``(id, band_idx, band_hash)`` once from the corpus, write it as a
    parquet table bucketed (and sorted) on ``band_hash``, and return the
    table read. Subsequent calls (and subsequent harness/bench runs in the
    same warehouse) skip the build entirely — the daily-delta probe join
    then reads buckets in place, so incremental dedup cost is genuinely
    O(|delta|) instead of a full-corpus re-signature per run (the r9
    VERDICT perf finding).

    Bucketing on ``band_hash`` satisfies the probe join's clustered
    distribution (band_hash ⊆ join keys), so only the small delta side
    shuffles. Size ``buckets`` for the corpus: ≈ one bucket per executor
    core at the target scale.

    The table is content-stamped only by its NAME — callers must encode
    the corpus identity (e.g. the sf_dir tag) in ``table``; a changed
    corpus under the same name must be dropped first. That is the standard
    contract of any persisted index.

    Build-once is per CATALOG: with the default in-memory catalog the
    table registration dies with the session while its warehouse
    directory survives on disk, and ``saveAsTable`` refuses to adopt an
    existing location (LOCATION_ALREADY_EXISTS). A stale location without
    catalog metadata is also USELESS as an index — the bucket spec lives
    in the catalog, so reading the bare parquet would silently lose the
    shuffle-free probe join. So: catalog-unknown + location-on-disk ⇒
    retire the stale directory and rebuild. With a persistent (Hive)
    metastore the build genuinely runs once across sessions.

    Safety hardening (ADVICE r10 #2): the retire is an ATOMIC RENAME to a
    unique ``.stale-*`` sibling before deletion — two sessions sharing one
    warehouse can race here, and rename-then-delete means the loser gets a
    clean miss instead of reading a half-deleted directory; the target is
    also asserted to live INSIDE the session warehouse before anything is
    removed. And because the name-only content stamp can silently serve a
    stale index when the corpus changes under the same tag, the build
    stores a corpus fingerprint (row count + max id) as table properties,
    re-checked on read once per (session, table, corpus-plan semanticHash)
    — a DIFFERENT corpus plan under the same tag re-scans and rebuilds,
    while repeated reads of the same plan skip the scan. In-session
    mutation of the files UNDER an unchanged plan is outside the contract
    (Spark's own InMemoryFileIndex caches listings per plan the same way);
    cross-session staleness always re-checks."""
    # one id-column scan per (session, table, corpus-plan) — the
    # fingerprint guards CROSS-session staleness; within a session the
    # same corpus plan under a given table tag is stable, so repeated
    # index reads (harness rounds, bench iterations) must not re-pay the
    # scan. semanticHash distinguishes a DIFFERENT corpus under the same
    # tag without running a job.
    memo_key = (
        spark.sparkContext.applicationId,
        table,
        corpus._jdf.queryExecution().analyzed().semanticHash(),
    )
    fingerprint = _BAND_INDEX_FP_MEMO.get(memo_key)
    if fingerprint is None:
        fp_row = corpus.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.col(id_col)).alias("mx")
        ).collect()[0]
        fingerprint = f"{fp_row['n']}:{fp_row['mx']}"
        _BAND_INDEX_FP_MEMO[memo_key] = fingerprint

    if spark.catalog.tableExists(table):
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        if props.get("corpus_fingerprint") == fingerprint:
            return spark.table(table)
        # same tag, different corpus: the documented silent-staleness hole —
        # drop (which also removes the managed location) and rebuild
        spark.sql(f"DROP TABLE {table}")

    retire_orphan_location(spark, table)
    if banding is not None:
        # alternate banding scheme (e.g. the engine-portable md5-string
        # minhash of streaming/dedup_stream.py, so the stream's
        # accumulated state can be COMPACTED into this table) — the
        # caller owns encoding the scheme in the table name
        idx = banding(corpus)
    else:
        from rocana_impala_udfs_spark.operators.dedup import minhash_band_index

        idx = minhash_band_index(
            corpus, num_hashes=num_hashes, bands=bands, text_col=text_col, id_col=id_col, k=k
        )
    (
        idx.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "band_hash")
        .sortBy("band_hash")
        .saveAsTable(table)
    )
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ('corpus_fingerprint' = '{fingerprint}')"
    )
    return spark.table(table)


def compact_band_delta_into_index(
    spark: SparkSession,
    table: str,
    delta_bands: DataFrame,
    corpus_after: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """INDEX-LIFECYCLE COMPACTION (VERDICT r11 missing #2): merge band
    rows ACCUMULATED BY THE STREAMING INDEX into the standing persisted
    band table, closing the "stream accumulates, batch compacts, probe
    reads both" loop every production near-dup service runs.

    ``delta_bands`` is ``(id, band_idx, band_hash)`` — exactly the
    content of the tws processor's per-bucket ``ListState``
    (``streaming.dedup_stream.running_lsh_index_tws``), which is by
    construction the stateless banding of the delta documents
    (``md5_band_columns``; equality pinned in ``tests/test_pipeline.py``).
    The rows are APPENDED with the table's own bucket spec — Spark
    allows multiple files per bucket, so compaction writes only
    O(|delta|) data, never rewrites the standing corpus, and the probe
    join's shuffle-free bucketed read survives.

    ``corpus_after`` must be the standing∪delta document frame: its
    fingerprint (row count + max id — the
    :func:`ensure_minhash_band_index` stamp) is written to the table
    properties and pre-seeded into the in-session memo, so the NEXT
    ``ensure_minhash_band_index(corpus_after, table)`` call recognizes
    the compacted table as already covering the full corpus and skips
    the rebuild — that recognition is what makes the lifecycle O(|delta|)
    per cycle instead of O(corpus).

    Returns the refreshed table read."""
    rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    info = {str(r["col_name"]).strip(): str(r["data_type"]).strip() for r in rows}
    buckets = int(info["Num Buckets"])
    (
        delta_bands.select("id", "band_idx", "band_hash")
        .write.mode("append")
        .format("parquet")
        .bucketBy(buckets, "band_hash")
        .sortBy("band_hash")
        .saveAsTable(table)
    )
    fp_row = corpus_after.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.col(id_col)).alias("mx")
    ).collect()[0]
    fingerprint = f"{fp_row['n']}:{fp_row['mx']}"
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ('corpus_fingerprint' = '{fingerprint}')"
    )
    memo_key = (
        spark.sparkContext.applicationId,
        table,
        corpus_after._jdf.queryExecution().analyzed().semanticHash(),
    )
    _BAND_INDEX_FP_MEMO[memo_key] = fingerprint
    spark.catalog.refreshTable(table)
    return spark.table(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
