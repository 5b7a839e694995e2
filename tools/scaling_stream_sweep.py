#!/usr/bin/env python
"""Streaming scale curves (VERDICT r13 #2): SCALING_r13 measured batch only;
this sweep replays the stateful streaming keys at 1×/10×/100× and records,
per SF point:

- ``sec``: wall time of the full key (build → run-to-completion → count;
  for streaming keys the pipeline executes inside the query FUNCTION call,
  so the build is timed, and ``count()`` replaces ``collect()`` — the 100×
  dedup key's sink is the 10M-row events table and a driver collect would
  measure Arrow transfer, not the operator).
- ``marginal``: sec minus the same key's time on the 100×-smaller sf0.001
  replay (the machinery cost — query startup, state-store open, micro-batch
  scheduling — measured once per key, the bench.py decomposition).
- ``state_rows`` / ``state_mem_mb``: the final micro-batch's
  ``stateOperators`` totals (``numRowsTotal``, ``memoryUsedBytes``) from
  ``StreamingQueryProgress``, read through ``streaming.replay.LAST_PROGRESS``
  — i.e. through the exact driver-key path.

Exponents are fitted on MARGINAL time and on state rows: the design claims
under test are "state is O(groups×k) / O(distinct ids in horizon)" and
"marginal time is linear in rows replayed".

Usage:
  python tools/scaling_stream_sweep.py [--keys k1,k2] [--out FILE] [--runs N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_POINTS = [
    ("1x", "/root/testdata/sf0.1", 1),
    ("10x", os.path.join(REPO, "testdata_scaled", "sf1x"), 10),
    ("100x", os.path.join(REPO, "testdata_scaled", "sf10x"), 100),
]
FIXED_DIR = "/root/testdata/sf0.001"

# One representative per stateful-operator class (the VERDICT r13 #2 list):
# bounded k-row grouped state (top-k), one-row-per-key complete-mode state
# (CDC latest-wins), transformWithState typed ValueState (tws EWMA), and
# horizon-bounded dedup state (dropDuplicatesWithinWatermark — state is
# O(distinct ids in horizon) BY CONTRACT, so its state curve is expected
# linear and the disclosure is the point). r15 (VERDICT r14 #5) adds the
# two remaining state shapes: session windows (state = open sessions) and
# the stream-stream join buffers (state = watermark+delay-bounded rows on
# BOTH sides; the left-outer twin also holds the null-emission timers).
DEFAULT_KEYS = [
    "stream_topk_events_per_type",
    "stream_topk_events_merge",
    "stream_cdc_latest_state",
    "stream_cdc_latest_merge",
    "stream_cdc_user_day_merge",
    "stream_cdc_user_day_complete",
    "stream_tws_ewma_user_value",
    "stream_dedup_within_watermark",
    "stream_session_windows",
    "stream_session_windows_append_bounded",
    "stream_stream_interval_join",
    "stream_join_left_outer_nulls",
]

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Keys whose declared semantics cannot scale past a multiplier, with the
# measured reason: complete-mode session windows re-emit the ENTIRE result
# (state = all sessions ever) into the in-JVM memory sink every trigger —
# at 100× that is ~9.5M session rows × re-emission and the r15 sweep
# measured the failure (Java heap OOM in MemoryStreamingWrite, epoch 2).
# The production shape is the append-mode watermark-evicted twin
# (`stream_session_windows_append_bounded`), swept uncapped right next to
# it — the pairing IS the disclosure.
MAX_MULT = {"stream_session_windows": 10}
CAP_REASON = {
    "stream_session_windows": (
        "complete-mode certification vehicle: every trigger re-emits the "
        "full session table into the in-JVM memory sink, so driver memory "
        "bounds the reachable SF (measured: heap OOM at 100x, r15); the "
        "append-mode bounded twin stream_session_windows_append_bounded "
        "is the production shape and runs uncapped"
    ),
}


def _extra_builders():
    """Sweep-only measurement harnesses that are not registry keys.

    ``stream_session_windows_append_bounded``: the registry key runs
    session windows in COMPLETE mode (the certification vehicle — its
    state is the whole materialized result by definition); this twin runs
    the PRODUCTION shape — time-ordered replay, 30-min watermark, APPEND
    mode — where closed sessions evict and state is O(open sessions), the
    declared bound VERDICT r14 #5 asked to see measured."""
    from pyspark.sql import functions as F

    def session_append(spark, d):
        from rocana_impala_udfs_spark.streaming.replay import (
            replay_events_stream_ordered,
            run_to_table,
        )

        stream, _dir = replay_events_stream_ordered(spark, d)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return run_to_table(agg, mode="append")

    def cdc_user_day_complete(spark, d):
        """Sweep-only complete-mode twin of stream_cdc_user_day_merge:
        same per-(user, day) latest-wins aggregate, memory sink in
        complete mode — re-emits ALL keys every trigger, so its
        sink_rows_cumulative is T×K against the merge twin's ~K (each
        key touched in ~one ordered-replay trigger). The pairing
        quantifies what the foreachBatch merge sink saves at high key
        cardinality; the per-user pair brackets the other end (every key
        touched every trigger, deltas == table)."""
        from rocana_impala_udfs_spark.streaming.replay import (
            replay_events_stream_ordered,
            run_to_table,
        )

        stream, _dir = replay_events_stream_ordered(spark, d)
        rows = stream.select(
            "user_id",
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            "value",
        )
        latest = rows.groupBy("user_id", "day").agg(
            F.max_by(
                F.struct("value", "ts_us", "event_id"),
                F.struct(F.col("ts_us"), F.col("event_id")),
            ).alias("s"),
            F.count(F.lit(1)).alias("n_events"),
        )
        return run_to_table(latest, mode="complete")

    return {
        "stream_session_windows_append_bounded": session_append,
        "stream_cdc_user_day_complete": cdc_user_day_complete,
    }


def _fit(xs, ys):
    pts = [(math.log(x), math.log(y)) for x, y in zip(xs, ys) if y and y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    if sxx == 0:
        return None
    return sum((p[0] - mx) * (p[1] - my) for p in pts) / sxx


def _state_totals() -> tuple[int | None, float | None, int | None, int | None]:
    from rocana_impala_udfs_spark.streaming import replay

    # cumulative rows the sink received across ALL triggers (r16): for the
    # complete-mode keys this is the re-emission volume; for the
    # foreachBatch-merge twins it is the upsert log's total delta rows —
    # the pairing quantifies what the merge sink shape saves
    sink_rows = replay.LAST_PROGRESS.get("sink_rows_total")
    prog = replay.LAST_PROGRESS.get("progress")
    if not prog:
        return None, None, None, sink_rows
    ops = prog.get("stateOperators") or []
    rows = sum(int(o.get("numRowsTotal") or 0) for o in ops)
    mem = sum(int(o.get("memoryUsedBytes") or 0) for o in ops)
    return rows, round(mem / 1e6, 3), len(ops), sink_rows


def _timed_run(fn, spark, d) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn(spark, d).count()
    return time.perf_counter() - t0, n


def main() -> int:
    keys = DEFAULT_KEYS
    out_path = os.path.join(REPO, "SCALING_STREAM_r15.json")
    runs = 2
    provider = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--keys":
            keys = args.pop(0).split(",")
        elif a == "--out":
            out_path = args.pop(0)
        elif a == "--runs":
            runs = int(args.pop(0))
        elif a == "--provider":  # 'rocksdb' re-runs the sweep on the
            # disk-backed store (VERDICT r14 #3: the heap store held 2.1 GB
            # of dedup state at 100× with a 1.47 marginal tail — churn)
            provider = args.pop(0)
    from rocana_impala_udfs_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("scaling-stream-sweep")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    qs = dict(entrymod.queries())
    qs.update(_extra_builders())
    missing = [d for _, d, _ in SF_POINTS if not os.path.isdir(d)]
    if missing:
        print(f"missing SF dirs {missing}: run tools/make_scaled_sf.py first")
        return 1

    results: dict[str, dict] = {}
    if provider:
        results["_provider"] = {"state_store": provider}
    for key in keys:
        if key not in qs:
            print(f"skip {key}: not in queries()")
            continue
        row: dict = {"points": {}}
        from rocana_impala_udfs_spark.session import reset_autosize

        # machinery cost: the same pipeline on the 100×-smaller replay
        # (warmup pays the one-time replay write + codegen)
        reset_autosize(spark)
        _timed_run(qs[key], spark, FIXED_DIR)
        fixed, _ = _timed_run(qs[key], spark, FIXED_DIR)
        row["fixed_sec"] = round(fixed, 3)
        if key in MAX_MULT:
            row["capped_at_mult"] = MAX_MULT[key]
            row["capped_reason"] = CAP_REASON[key]
        for label, d, mult in SF_POINTS:
            if mult > MAX_MULT.get(key, 10**9):
                break
            # per-SF sizing epoch (ADVICE r14 #1: autosizing is sticky-max)
            reset_autosize(spark)
            try:
                _timed_run(qs[key], spark, d)  # warmup: replay write, codegen
                best, n_rows, st = None, 0, (None, None, None, None)
                for _ in range(runs):
                    dt, n_rows = _timed_run(qs[key], spark, d)
                    if best is None or dt < best:
                        best = dt
                        st = _state_totals()
            except Exception as exc:
                row["points"][label] = {
                    "error": f"{type(exc).__name__}: {exc}"[:300], "mult": mult
                }
                print(f"{key} @{label}: FAILED {type(exc).__name__}", flush=True)
                break
            rows_state, mem_mb, n_ops, sink_rows = st
            row["points"][label] = {
                "sec": round(best, 3),
                "marginal_sec": round(max(best - fixed, 0.0), 3),
                "state_rows": rows_state,
                "state_mem_mb": mem_mb,
                "state_operators": n_ops,
                "sink_rows_cumulative": sink_rows,
                "rows_out": n_rows,
                "mult": mult,
            }
            print(
                f"{key} @{label}: {best:.2f}s marginal={max(best - fixed, 0):.2f}s "
                f"state_rows={rows_state} state_mem={mem_mb}MB "
                f"sink_rows={sink_rows} rows_out={n_rows}",
                flush=True,
            )
        ok = [p for p in row["points"].values() if "sec" in p]
        mults = [p["mult"] for p in ok]
        row["exponent_marginal_tail"] = (
            round(e, 3)
            if (e := _fit(mults[-2:], [p["marginal_sec"] for p in ok][-2:])) is not None
            else None
        )
        row["exponent_state_rows"] = (
            round(e, 3)
            if (e := _fit(mults, [p["state_rows"] or 0 for p in ok])) is not None
            else None
        )
        results[key] = row
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
