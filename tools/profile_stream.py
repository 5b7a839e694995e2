"""Per-trigger cost decomposition for the Python-stateful streaming keys
(optimization round instrument, guide §1 / VERDICT r16 #2).

Runs the EWMA streaming pipelines exactly as the driver keys do (same
replay, same runners' conf override) but keeps EVERY StreamingQueryProgress
and prints the per-trigger ``durationMs`` breakdown — addBatch (execution),
queryPlanning, getBatch/latestOffset (source), walCommit/commitOffsets —
plus the per-stateful-operator times, so "fixed machinery" gets named.

Usage: python tools/profile_stream.py [sf_dir] [ewma|tws|both] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rocana_impala_udfs_spark import get_spark  # noqa: E402


def run_one(spark, sf_dir: str, which: str) -> dict:
    from rocana_impala_udfs_spark.streaming.ewma_stream import (
        running_ewma_stream,
        running_ewma_tws,
    )
    from rocana_impala_udfs_spark.streaming import replay
    from rocana_impala_udfs_spark.plans.temporal import _with_rocksdb_state_store

    stream, d = replay.replay_events_stream_ordered(spark, sf_dir)
    if which == "tws":
        out = running_ewma_tws(stream, alpha=0.1)
    else:
        out = running_ewma_stream(stream, alpha=0.1)

    ov = replay._stream_conf_override(out, None)
    if ov is not None:
        spark.conf.set(ov[0], ov[1])

    progresses: list = []

    def go():
        import uuid

        name = "prof_" + uuid.uuid4().hex[:12]
        t0 = time.perf_counter()
        q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
        try:
            q.processAllAvailable()
            progresses.extend(q.recentProgress)
        finally:
            q.stop()
        return time.perf_counter() - t0

    try:
        if which == "tws":
            wall = _with_rocksdb_state_store(spark, go)
        else:
            wall = go()
    finally:
        if ov is not None:
            if ov[2] is None:
                spark.conf.unset(ov[0])
            else:
                spark.conf.set(ov[0], ov[2])

    return {"wall": wall, "progresses": progresses}


def summarize(tag: str, res: dict) -> None:
    print(f"\n=== {tag}: wall {res['wall']:.3f}s, {len(res['progresses'])} triggers ===")
    tot: dict[str, float] = {}
    for p in res["progresses"]:
        dm = p.get("durationMs") or {}
        rows = p.get("numInputRows", 0)
        parts = " ".join(f"{k}={v}" for k, v in sorted(dm.items()))
        ops = p.get("stateOperators") or []
        opstr = ""
        if ops:
            o = ops[0]
            keys = [
                "allUpdatesTimeMs",
                "allRemovalsTimeMs",
                "commitTimeMs",
                "numRowsTotal",
                "numRowsUpdated",
            ]
            opstr = " | state " + " ".join(f"{k}={o.get(k)}" for k in keys if k in o)
        print(f"  rows={rows:<7} {parts}{opstr}")
        for k, v in dm.items():
            tot[k] = tot.get(k, 0.0) + float(v)
    print("  TOTALS(ms): " + " ".join(f"{k}={int(v)}" for k, v in sorted(tot.items())))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    which = args.pop(0) if args else "both"
    repeats = int(args.pop(0)) if args else 2
    spark = get_spark("profile-stream")
    targets = ["ewma", "tws"] if which == "both" else [which]
    for t in targets:
        for i in range(repeats):
            res = run_one(spark, sf_dir, t)
            summarize(f"{t} run{i}", res)
    spark.stop()


if __name__ == "__main__":
    main()
