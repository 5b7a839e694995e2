"""Local replica of the driver's correctness gate: run every __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, then compare row count, column names, and (order-insensitively)
values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rocana_impala_udfs_spark import get_spark  # noqa: E402
from rocana_impala_udfs_spark.sources.io import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[list[str], list[str]]:
    """Returns (problems, near_misses). The driver's gate is an EXACT
    value-hash; a float column that only passes within 1e-9 locally can
    still hash-mismatch there, so exact-vs-close divergence is surfaced
    as a near-miss instead of being silently absorbed."""
    problems: list[str] = []
    near: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} vs oracle {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} vs oracle {sorted(odf.columns)}")
        return problems, near
    if problems:
        return problems, near
    a, b = canon(sdf.copy()), canon(odf.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        a_int = np.issubdtype(av.dtype, np.integer)
        b_int = np.issubdtype(bv.dtype, np.integer)
        a_flt = np.issubdtype(av.dtype, np.floating)
        b_flt = np.issubdtype(bv.dtype, np.floating)
        if (a_int and b_flt) or (a_flt and b_int):
            # Equal values with different dtypes (1 == 1.0) pass isclose but
            # FAIL the driver's exact value-hash — this is the DuckDB-HUGEINT
            # (window sum widened to float64) class that caused three driver
            # hash failures.  Surface it loudly instead of absorbing it.
            near.append(
                f"col {c}: dtype mismatch spark={av.dtype} vs oracle={bv.dtype} "
                f"— driver exact-hash risk (cast the oracle aggregate)"
            )
        if a_flt or b_flt:
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
            exact = (av.to_numpy() == bv.to_numpy()) | (av.isna() & bv.isna()).to_numpy()
            bad = ~close
            if (~exact & close).any():
                i = int(np.argmax(np.asarray(~exact & close)))
                near.append(
                    f"col {c}: {int((~exact & close).sum())} values differ in low bits "
                    f"(e.g. {av.iloc[i]!r} vs {bv.iloc[i]!r}) — driver exact-hash risk"
                )
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = int(np.argmax(np.asarray(bad)))
            problems.append(f"col {c}: {int(bad.sum())} mismatches, first at row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return problems, near


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in osql:
            print(f"weak {name}: rows-only check, {len(sdf)} rows")
            n_weak += 1
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems, near = compare(sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            tag = " NEAR[" + "; ".join(near) + "]" if near else ""
            print(f"pass {name} ({len(sdf)} rows){tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
