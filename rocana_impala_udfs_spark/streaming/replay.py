"""Bounded stream replay → batch-comparable result.

The bridge that makes Structured Streaming DRIVER-CHECKABLE: a streaming
query over a bounded replay of a table, run to completion into a memory
sink, returns an ordinary DataFrame — so a streaming operator can carry the
same DuckDB oracle as its batch twin instead of living only in pytest.

Exactness contract, by output mode:

- COMPLETE: after the final micro-batch, complete mode's result table IS
  the batch aggregation of everything replayed — no watermark-dependent
  row drops, no update-mode duplicates in the sink.
- APPEND (+ watermark, TIME-ORDERED replay only): a window/session emits
  exactly once, when the final watermark (global max ts − delay) passes
  its end — a deterministic function of the data, so the closed sink is
  oracle-checkable too (``stream_hourly_append_watermark``,
  ``stream_session_windows_append``; the end==watermark boundary is
  CLOSED, pinned by the r15 synthetic experiment).
- UPDATE via ``run_foreach_batch_merge``: per-trigger delta emissions are
  last-writer-wins-merged into a keyed target; the final target equals
  the complete-mode final table (a key's newest emission carries its
  full aggregate state), so the same batch oracle applies.

Remaining streaming==batch properties for raw update/append sinks stay
pinned in tests/test_streaming.py.

Scale note: the replay writes the normalized table once to a temp dir and
streams it back with maxFilesPerTrigger=1, so the query genuinely runs as
multiple micro-batches with state carried between them — not one giant
batch in disguise.

Performance note (r16): the runners size the query's state-store partition
count (``spark.sql.shuffle.partitions``, which AQE cannot coalesce for
stateful workloads) from the bytes actually replayed via
``session.autosize_stream_state_partitions`` and RESTORE the conf after the
query stops. Results are partitioning-invariant (keyed aggregation state,
watermark advancement and foreachBatch deltas do not depend on the reduce
partition count); what changes is per-micro-batch task count and
state-store file count — measured 2-3× of every JVM-stateful benched key's
warm time at sf0.1.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from rocana_impala_udfs_spark.sources.io import load_table


_REPLAY_DIRS: dict = {}

# Most-recent replay source dir built in this process — the state-partition
# autosizer's input (r16): every plan function builds its replay source(s)
# and immediately runs the query through one of the runners below, so "the
# last replay dir written" is the data the next query replays. Runners that
# see no hint (direct writeStream users, tests) change nothing.
_STATE_PARTITION_HINT: dict = {"dir": None}


def _stream_conf_override(
    out: DataFrame,
    python_stateful: bool | None = None,
    replay_dir: str | None = None,
):
    """(conf_key, new_value, old_value) for the state-partition override of
    the query about to start, or None when no replay dir is known. The
    sizing input is ``replay_dir`` when the caller threads it explicitly
    (ADVICE r16 #1); otherwise the module hint left by the last replay
    builder in this process. The Python-stateful floor is detected from the
    analyzed logical plan (the stateful *InPandas*/*InPySpark* operators
    parallelize real Python compute across state partitions — see
    session.autosize_stream_state_partitions); a plan function that KNOWS
    its Python state is domain-bounded (a handful of group keys, so
    core-count state partitions are mostly empty stores) declares
    ``python_stateful=False`` explicitly to keep the machinery floor
    instead."""
    d = replay_dir or _STATE_PARTITION_HINT.get("dir")
    if not d or not os.path.isdir(d):
        return None
    from rocana_impala_udfs_spark.session import autosize_stream_state_partitions

    if python_stateful is None:
        try:
            plan = out._jdf.queryExecution().analyzed().toString()
        except Exception:
            plan = ""
        # Match the specific STATEFUL operator nodes (ADVICE r16 #4): the
        # generic "InPandas" substring also matches stateless mapInPandas
        # kernels (e.g. a brute-force scoring stage) in a plan whose
        # stateful operator is JVM-side, which kept core-count partitions
        # where the machinery floor was intended.
        python_stateful = (
            "FlatMapGroupsInPandasWithState" in plan
            or "TransformWithStateInPySpark" in plan
            or "TransformWithStateInPandas" in plan
        )
    n = autosize_stream_state_partitions(
        out.sparkSession, d, python_stateful=python_stateful
    )
    key = "spark.sql.shuffle.partitions"
    return key, str(n), out.sparkSession.conf.get(key, None)

# Most-recent streaming run's final stateful-operator progress, refreshed by
# every run_to_table call (None when the query had no stateful operator).
# The streaming scale sweep (tools/scaling_stream_sweep.py, VERDICT r13 #2)
# reads state-store growth — numRowsTotal / memoryUsedBytes per operator —
# through the EXACT driver-key path without threading a capture list into
# every plan function.
LAST_PROGRESS: dict = {"progress": None}
# ``sink_rows_total`` (r16): cumulative rows the query's SINK received
# across ALL triggers — complete mode re-emits the whole result table per
# trigger, so this is what quantifies the re-emission cost the
# foreachBatch-merge twins avoid (their number is the upsert log's total
# delta rows). Read by tools/scaling_stream_sweep.py.


def replay_events_stream(
    spark: SparkSession, sf_dir: str, copies: int = 1, files: int = 4
) -> tuple[DataFrame, str]:
    """Write the normalized events table to a temp dir (``copies`` times —
    >1 plants exact duplicates for dedup operators) split into ``files``
    files, and open it as a file-source stream, one file per micro-batch.
    Returns (stream_df, replay_dir). The written replay is memoized per
    (sf_dir, copies, files) for the process lifetime — repeated runs
    (bench does 3) skip the rewrite; ``cleanup`` drops the memo too.
    """
    ev = load_table(spark, sf_dir, "events")
    key = (sf_dir, copies, files)
    d = _REPLAY_DIRS.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="replay_events_")
        for i in range(copies):
            # repartition, not coalesce: the source table is often a single
            # scan partition, and coalesce cannot INCREASE partition count —
            # the replay would collapse to one file / one micro-batch.
            ev.repartition(max(files // copies, 1)).write.mode(
                "append" if i else "overwrite"
            ).parquet(d)
        _REPLAY_DIRS[key] = d
    _STATE_PARTITION_HINT["dir"] = d
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return stream, d


def replay_events_stream_ordered(
    spark: SparkSession, sf_dir: str, files: int = 4
) -> tuple[DataFrame, str]:
    """Time-ordered bounded replay for WATERMARK semantics: each file
    holds one contiguous ts range and files are written (hence streamed)
    in ascending time order, like a real event feed. The round-robin
    replay is only valid for complete-mode aggregations — its every batch
    spans the whole timeline, so after batch 1 the watermark would
    classify most later rows as late and drop them, which is exactly the
    behavior append-mode keys must NOT trigger on in-order data.

    One file per micro-batch, ranges from exact ts quantiles; within-file
    disorder is harmless (the watermark only advances between batches).
    Memoized like :func:`replay_events_stream`.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    return _ordered_replay(
        spark,
        ev.withColumn("_us", F.unix_micros("ts")),
        order_col="_us",
        drop_order_col=True,
        memo_key=(sf_dir, "ordered", files),
        files=files,
        prefix="replay_events_ord_",
        schema=ev.schema,
    )


def run_to_table(
    out: DataFrame,
    mode: str = "complete",
    capture_plan: list | None = None,
    capture_progress: list | None = None,
    python_stateful: bool | None = None,
    replay_dir: str | None = None,
) -> DataFrame:
    """Run a streaming aggregation to completion into a memory sink and
    return the final result table (batch DataFrame).

    ``capture_plan``: when a list is passed, the query's EXECUTED physical
    plan string (``explainInternal`` of the last micro-batch) is appended to
    it before the query stops — tests pin operator choices (e.g.
    ``TransformWithStateInPandasExec``) through the exact driver-key path.

    ``capture_progress``: when a list is passed, the last non-empty
    ``StreamingQueryProgress`` dict is appended — tests pin the STATE
    STORE the query really ran on (the RocksDB provider reports
    ``rocksdb*`` customMetrics per stateful operator; the HDFS-backed
    default reports none) through the exact driver-key path.
    """
    name = "replay_" + uuid.uuid4().hex[:12]
    ov = _stream_conf_override(out, python_stateful, replay_dir)
    if ov is not None:
        out.sparkSession.conf.set(ov[0], ov[1])
    try:
        q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
        try:
            q.processAllAvailable()
            if capture_plan is not None:
                capture_plan.append(q._jsq.explainInternal(False))
            with_state = [p for p in q.recentProgress if p.get("stateOperators")]
            LAST_PROGRESS["progress"] = with_state[-1] if with_state else None
            LAST_PROGRESS["sink_rows_total"] = sum(
                n
                for p in q.recentProgress
                for n in [int((p.get("sink") or {}).get("numOutputRows", -1))]
                if n >= 0
            )
            if capture_progress is not None and with_state:
                capture_progress.append(with_state[-1])
        finally:
            q.stop()
    finally:
        # restore: batch operators read this conf as a parallelism target
        # (unset when there was no prior value — ADVICE r16 #3: skipping
        # the restore would leak the override into later batch plans)
        if ov is not None:
            if ov[2] is None:
                out.sparkSession.conf.unset(ov[0])
            else:
                out.sparkSession.conf.set(ov[0], ov[2])
    return out.sparkSession.table(name)


def run_foreach_batch_merge(
    out: DataFrame,
    key_cols: list,
    capture_progress: list | None = None,
    python_stateful: bool | None = None,
    replay_dir: str | None = None,
) -> DataFrame:
    """PRODUCTION SINK SHAPE for update-mode state (VERDICT r15 #4): run
    ``out`` with ``foreachBatch`` and MERGE each trigger's delta into a
    keyed target, last-writer-wins per ``key_cols`` — the Structured
    Streaming idiom for maintaining a materialized view in an external
    store, certifying the UPDATE path without complete-mode re-emission
    and without a sink that accumulates every historical emission.

    The merge is implemented as an append-only upsert log plus a
    compaction read — exactly what a warehouse MERGE INTO does under the
    hood, kept fully distributed (no driver collect): each batch appends
    its delta stamped with the batch id; the final read keeps, per key,
    the row from the newest batch. Correctness: an update-mode emission
    for a key carries the key's FULL aggregate state at that trigger, and
    a key's newest emission happens at the last trigger that touched it —
    after which no further input for it arrived — so newest-per-key IS
    the final state, equal to the complete-mode table and hence to the
    batch oracle.

    Scale: the streaming state is identical to the complete-mode twin
    (O(keys) aggregate state), but per-trigger SINK traffic is O(changed
    keys), not O(all keys), and the log is bounded by total deltas; a
    production deployment compacts it continuously (Delta/Iceberg MERGE)
    — here the one-shot compaction read is the certified equivalent.
    """
    log_dir = tempfile.mkdtemp(prefix="merge_log_")

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_df.withColumn("_merge_bid", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(log_dir)

    ov = _stream_conf_override(out, python_stateful, replay_dir)
    if ov is not None:
        out.sparkSession.conf.set(ov[0], ov[1])
    try:
        q = out.writeStream.outputMode("update").foreachBatch(_append).start()
        try:
            q.processAllAvailable()
            with_state = [p for p in q.recentProgress if p.get("stateOperators")]
            LAST_PROGRESS["progress"] = with_state[-1] if with_state else None
            if capture_progress is not None and with_state:
                capture_progress.append(with_state[-1])
        finally:
            q.stop()
    finally:
        if ov is not None:
            if ov[2] is None:
                out.sparkSession.conf.unset(ov[0])
            else:
                out.sparkSession.conf.set(ov[0], ov[2])
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = out.sparkSession
    log = spark.read.parquet(log_dir)
    # the log's total rows ARE the cumulative sink traffic: exactly the
    # delta rows every trigger appended (foreachBatch progress reports
    # numOutputRows=-1, so the log is the ground truth here)
    LAST_PROGRESS["sink_rows_total"] = log.count()
    w = Window.partitionBy(*key_cols).orderBy(F.col("_merge_bid").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_merge_bid")
    )


def cleanup(path: str) -> None:
    """Remove a replay dir and forget its memo entry. The query keys keep
    memoized replays for the process lifetime (a few MB in /tmp, rebuilt
    lazily if removed); tests use this for explicit teardown."""
    for k, v in list(_REPLAY_DIRS.items()):
        if v == path:
            del _REPLAY_DIRS[k]
    if path and os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def run_with_restart(spark: SparkSession, sf_dir: str, build_agg) -> DataFrame:
    """CHECKPOINT-RECOVERY harness: run a complete-mode aggregation over
    the first half of the replay files, STOP the query, add the remaining
    files, and restart a fresh query from the SAME checkpoint. The file
    source's committed offsets prevent re-reading (no double counting)
    and the state store restores the aggregation state (no loss) — so the
    final table must equal the batch aggregate of everything, which is
    the oracle. ``build_agg`` maps the stream DataFrame to the complete-
    mode aggregation."""
    import uuid as _uuid

    ev = load_table(spark, sf_dir, "events")
    _, src = replay_events_stream(spark, sf_dir)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    # The two-phase split needs at least one file on EACH side: with a
    # single file, phase 2 would copy nothing, the restarted query would
    # run zero micro-batches, and its fresh memory sink would come back
    # EMPTY — a silently wrong result rather than an error (r9 ADVICE).
    # Unreachable with the current 4-file replay layout; fail loudly if
    # the layout ever changes.
    if len(files) < 2:
        raise ValueError(
            f"run_with_restart needs >= 2 replay files to split across the "
            f"restart, found {len(files)} in {src}"
        )
    stage = tempfile.mkdtemp(prefix="restart_stage_")
    cp = tempfile.mkdtemp(prefix="restart_cp_")

    def run_once():
        s = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        name = "restart_" + _uuid.uuid4().hex[:12]
        agg = build_agg(s)
        # the staged dir is threaded explicitly (ADVICE r16 #1): this
        # runner replays its own staged copy, and the module hint still
        # points at the shared replay dir another query built
        ov = _stream_conf_override(agg, replay_dir=stage)
        if ov is not None:
            spark.conf.set(ov[0], ov[1])
        try:
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", cp)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            if ov is not None:
                if ov[2] is None:
                    spark.conf.unset(ov[0])
                else:
                    spark.conf.set(ov[0], ov[2])
        return name

    try:
        for f in files[: max(len(files) // 2, 1)]:
            shutil.copy(os.path.join(src, f), os.path.join(stage, f))
        run_once()  # phase 1: half the data, then a clean stop
        for f in files[max(len(files) // 2, 1):]:
            shutil.copy(os.path.join(src, f), os.path.join(stage, f))
        name = run_once()  # phase 2: recovered state + only the new files
        return spark.table(name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        # cp is left behind (a few KB in /tmp) — cleaning it here would be
        # fine for the materialized memory table, but a harmless leak beats
        # deleting a checkpoint another in-flight query name could reference


def _ordered_replay(
    spark: SparkSession,
    src: DataFrame,
    order_col: str,
    drop_order_col: bool,
    memo_key: tuple,
    files: int,
    prefix: str,
    schema,
) -> tuple[DataFrame, str]:
    """Shared ordered-replay writer: split ``src`` into ``files`` contiguous
    ``order_col`` ranges (exact quantiles at test scale), write them with
    strictly ascending mtimes (the file source picks oldest-mtime first, so
    replay order == range order deterministically), memoized per
    ``memo_key``. Degenerate inputs (empty table / all-NULL order column)
    collapse to however many ranges the quantiles support — never an
    index error, at worst a single-file replay."""
    from pyspark.sql import functions as F

    d = _REPLAY_DIRS.get(memo_key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=prefix)
        qs = [i / files for i in range(1, files)]
        cuts = src.approxQuantile(order_col, qs, 0.0) if files > 1 else []
        bounds = [None, *cuts, None]
        seen: set = set()
        t0 = None
        for i in range(len(bounds) - 1):
            part = src
            if bounds[i] is not None:
                part = part.filter(F.col(order_col) > bounds[i])
            if bounds[i + 1] is not None:
                part = part.filter(F.col(order_col) <= bounds[i + 1])
            if drop_order_col:
                part = part.drop(order_col)
            part.coalesce(1).write.mode("append" if i else "overwrite").parquet(d)
            for f in sorted(os.listdir(d)):
                fp = os.path.join(d, f)
                if f.endswith(".parquet") and f not in seen:
                    seen.add(f)
                    if t0 is None:
                        t0 = os.path.getmtime(fp)
                    os.utime(fp, (t0 + i, t0 + i))
        _REPLAY_DIRS[memo_key] = d
    _STATE_PARTITION_HINT["dir"] = d
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d)
    )
    return stream, d


def replay_documents_stream_ordered(
    spark: SparkSession, sf_dir: str, files: int = 3
) -> tuple[DataFrame, str]:
    """Doc-id-ordered bounded replay of the documents table — the ingest
    feed for streaming index-maintenance operators (arrival order :=
    doc_id order, one contiguous id range per micro-batch file, ascending
    mtimes like :func:`replay_events_stream_ordered`). Memoized."""
    docs = load_table(spark, sf_dir, "documents")
    return _ordered_replay(
        spark,
        docs,
        order_col="doc_id",
        drop_order_col=False,
        memo_key=(sf_dir, "docs_ordered", files),
        files=files,
        prefix="replay_docs_ord_",
        schema=docs.schema,
    )
