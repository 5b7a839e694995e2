"""Per-key stage-level profiler (optimization round instrument, guide §1).

For each named query key: run once to warm (codegen + Python pool), then
run again and attribute every stage SUBMITTED during the warm run to the
key via AppStatusStore (works with spark.ui.enabled=false, same mechanism
as tools/scaling_sweep.py). Prints per key: warm wall seconds, then each
stage's wall, summed executor run/CPU time, task count, shuffle read/write
bytes, input bytes and spill — the numbers that say WHERE the time goes
(shuffle-bound vs compute-bound vs scheduling-bound) without the UI.

Usage: python tools/profile_keys.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rocana_impala_udfs_spark import get_spark  # noqa: E402


def _opt(v):
    """Unwrap a scala Option-ish value defensively."""
    try:
        if v is None:
            return None
        if hasattr(v, "isDefined"):
            return v.get() if v.isDefined() else None
        return v
    except Exception:
        return None


def _stages(sc) -> dict[int, dict]:
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    stages = store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )
    out: dict[int, dict] = {}
    attempt: dict[int, int] = {}
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        sid, att = int(s.stageId()), int(s.attemptId())
        if sid in out and att < attempt[sid]:
            continue
        attempt[sid] = att
        sub = _opt(s.submissionTime())
        comp = _opt(s.completionTime())
        wall = None
        if sub is not None and comp is not None:
            try:
                wall = (comp.getTime() - sub.getTime()) / 1000.0
            except Exception:
                wall = None
        out[sid] = {
            "name": str(s.name())[:100],
            "tasks": int(s.numCompleteTasks()),
            "wall_s": wall,
            "run_s": int(s.executorRunTime()) / 1000.0,
            "cpu_s": int(s.executorCpuTime()) / 1e9,
            "in_mb": int(s.inputBytes()) / 1e6,
            "sh_r_mb": int(s.shuffleReadBytes()) / 1e6,
            "sh_w_mb": int(s.shuffleWriteBytes()) / 1e6,
            "spill_mb": int(s.diskBytesSpilled()) / 1e6,
        }
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    keys = args
    spark = get_spark("profile-keys")
    sc = spark.sparkContext
    qs = entrymod.queries()
    report = {}
    for key in keys:
        if key not in qs:
            print(f"!! unknown key {key}", file=sys.stderr)
            continue
        sc.setJobDescription(f"warmup:{key}")
        qs[key](spark, sf_dir).collect()  # warm: codegen, pools, replay memo
        before = set(_stages(sc))
        sc.setJobDescription(f"profile:{key}")
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        after = _stages(sc)
        new = {sid: d for sid, d in after.items() if sid not in before}
        report[key] = {"warm_wall_s": round(wall, 3), "stages": new}
        print(f"\n=== {key}: warm {wall:.3f}s, {len(new)} stages ===")
        for sid in sorted(new):
            d = new[sid]
            print(
                f"  s{sid:<5} wall={d['wall_s'] if d['wall_s'] is not None else '?':>6} "
                f"run={d['run_s']:7.2f} cpu={d['cpu_s']:7.2f} tasks={d['tasks']:<4} "
                f"in={d['in_mb']:8.2f}MB shR={d['sh_r_mb']:8.2f}MB "
                f"shW={d['sh_w_mb']:8.2f}MB spill={d['spill_mb']:6.1f}MB  {d['name']}"
            )
    out = os.environ.get("PROFILE_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
