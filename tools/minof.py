"""Min-of-N warm timer in ONE session (optimization-round instrument).

The sandbox's shared virtual disk stalls intermittently (r16 diagnosis), so
single warm runs are unusable; the committed before/after numbers are the
min over N interleaved warm executions in one JVM — the same protocol
OPTIMIZATION_r16.md used. Plans are rebuilt per execution (the bench's
timed-region contract).

Usage: python tools/minof.py [sf_dir] [N] key [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rocana_impala_udfs_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    n = 3
    if args and args[0].isdigit():
        n = int(args.pop(0))
    keys = args
    spark = get_spark("minof")
    qs = entrymod.queries()
    for k in keys:  # cold warmup pass, untimed
        qs[k](spark, sf_dir).collect()
    times: dict[str, list[float]] = {k: [] for k in keys}
    for _ in range(n):
        for k in keys:
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).collect()
            times[k].append(time.perf_counter() - t0)
    for k in keys:
        ts = sorted(times[k])
        print(f"{k}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} all={[round(t,2) for t in times[k]]}")
    spark.stop()


if __name__ == "__main__":
    main()
