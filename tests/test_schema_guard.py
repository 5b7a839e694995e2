"""Static decimal-vs-float schema guard (VERDICT r7 #7 / r8 missing #2).

The r7 driver red (`sql_text_monthly_nation_rank`) was a CLASS failure:
Spark's final projection emitted DECIMAL(28,2) while the oracle's DuckDB →
pandas bridge produced float64 — equal values, different hash lexemes
('...80' vs '...8').  The fix was per-key; this test guards the class for
every oracle-bearing key:

- Spark side: no DecimalType may survive to a final projection (pandas
  renders it as `decimal.Decimal` objects → stringified with trailing
  zeros — never hash-equal to a float64 column).
- Oracle side: `DESCRIBE <sql>` (binds without executing) may not report
  DECIMAL(...) or HUGEINT in the result — both widen to float64/object in
  `.df()` and hash-mismatch Spark BIGINT/DOUBLE (the classic un-cast
  `sum()` HUGEINT class, three driver failures in r4-r5).
- Cross: a column must not be integer-class on one engine and
  float-class on the other (1 vs 1.0 passes isclose but fails the
  driver's exact value-hash).

Spark plans are only BUILT (sf0.001) — execution happens solely for the
few documented driver-interactive keys whose construction materializes
bounded aggregates.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry
from rocana_impala_udfs_spark.sources.io import TABLES

SF = "/root/testdata/sf0.001"

_SPARK_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_SPARK_FLT = (T.FloatType, T.DoubleType)
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLT = {"FLOAT", "REAL", "DOUBLE"}


def _spark_class(dt) -> str:
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, _SPARK_INT):
        return "int"
    if isinstance(dt, _SPARK_FLT):
        return "float"
    return "other"


def _duck_class(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL") or t == "HUGEINT":
        return "decimal"
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLT:
        return "float"
    return "other"


def test_no_decimal_or_int_float_split_in_final_schemas(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, osql = entry.queries(), entry.oracle_sql()
    offenders: list[str] = []
    for name, fn in qs.items():
        sql = osql.get(name)
        if sql is None:
            continue  # weak-by-design: no oracle hash to protect
        try:
            sch = {f.name: _spark_class(f.dataType) for f in fn(spark, SF).schema.fields}
        except Exception as e:  # surface, don't crash the sweep
            offenders.append(f"{name}: spark plan build raised {type(e).__name__}: {e}")
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            offenders.append(f"{name}: oracle DESCRIBE raised {type(e).__name__}: {e}")
            continue
        och = {row[0]: _duck_class(row[1]) for row in desc}
        for col in set(sch) | set(och):
            sc, oc = sch.get(col), och.get(col)
            if sc is None or oc is None:
                continue  # column-name mismatch is the harness's job
            if sc == oc:
                # decimal==decimal is allowed: a deliberately-DECIMAL key
                # (exact_median_price_decimal, §2.1 row 13) hashes green
                # when BOTH bridges render the same lexeme — the failure
                # class is the SPLIT, not the type.
                continue
            if "decimal" in (sc, oc) or {sc, oc} == {"int", "float"}:
                offenders.append(
                    f"{name}.{col}: numeric class split spark={sc} oracle={oc} "
                    "— driver exact-hash risk (cast both sides to the same class)"
                )
    assert not offenders, "\n".join(offenders)
