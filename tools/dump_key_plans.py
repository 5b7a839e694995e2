"""Dump ``explain("formatted")`` for named declared keys into
``plans/r17/<key>_<tag>.txt`` — the before/after plan evidence the
optimization rounds commit alongside bench numbers (guide §1.4/§7.2).

For STREAMING keys the batch plan of the final sink table is meaningless;
those keys capture the executed micro-batch plan via the runners'
``capture_plan`` hook instead (see plans/r16 for the convention), so this
tool simply dumps whatever ``queries()[key]`` returns — for streaming keys
that is the post-replay batch DataFrame, and the executed stream plan is
captured separately where it matters.

Usage: python tools/dump_key_plans.py <tag> [sf_dir] key [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rocana_impala_udfs_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit("usage: dump_key_plans.py <tag> [sf_dir] key [key ...]")
    tag = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-key-plans")
    qs = entrymod.queries()
    for key in args:
        df = qs[key](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        p = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(plan)
        print(f"wrote {p} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
