"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key; the driver compares
row-count + schema + order-insensitive value-hash at sf0.01.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL. Float aggregates are rounded in both engines
so summation-order differences can't flip the value hash; exact medians
return actual data elements and are hash-stable without rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rocana_impala_udfs_spark import register_all
from rocana_impala_udfs_spark.vendor.pbshim import ensure_protobuf

# transformWithStateInPandas workers import google.protobuf; activating the
# vendored shim at import time puts it on PYTHONPATH before the hosting
# harness launches its JVM (workers inherit the JVM's launch environment).
ensure_protobuf()
from rocana_impala_udfs_spark.plans import relational
from rocana_impala_udfs_spark.plans.medians import MEDIAN_ORACLE, MEDIAN_QUERIES
from rocana_impala_udfs_spark.plans.pipeline import PIPELINE_ORACLE, PIPELINE_QUERIES
from rocana_impala_udfs_spark.plans.temporal import TEMPORAL_ORACLE, TEMPORAL_QUERIES
from rocana_impala_udfs_spark.plans.tpch import TPCH_ORACLE, TPCH_QUERIES
from rocana_impala_udfs_spark.sources.io import register_temp_views

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bounded-median of lineitem extended price per return flag,
    via the scalable two-phase reservoir operator (the reference's one
    function, distributed the reference's way)."""
    register_all(spark)
    register_temp_views(spark, SF_SMOKE)
    return MEDIAN_QUERIES["appx_median_price_by_returnflag"](spark, SF_SMOKE)


# Ordering is deliberate: the driver's correctness run truncates on a time
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-14 order
# (every key entered r14 with a hash-green latest driver row — VERDICT
# r13: 332/332 oracle keys green across the r1-r13 union — so the front
# is r14's changes per the standing contract): (1) keys whose EXECUTED
# CODE changed in r14, values locally re-verified oracle-green before
# commit: emb_neardup_pairs (pair verify now runs the Arrow pair-cosine
# kernel instead of the HOF fold — bit-parity by construction, and the
# key whose hash gate certifies that kernel against DuckDB
# list_cosine_similarity), the two prefix-filter keys (verify arrays now
# collect_set — same values on distinct input, ADVICE r13 #3), and
# skyline (fan-in estimate stops at the topmost Exchange, ADVICE r13
# #2). Every OTHER key's plan is unchanged at driver SF: the r14
# autosizer floors to the old core-count default below ~256 MB of scan.
# Then (2) the nine weak-by-design keys (rows-only is their best
# evidence; they absorb any over-budget truncation harmlessly;
# semantic_dedup_pairs among them also runs the Arrow kernel now).
_NEVER_DRIVER_CHECKED = [
    # (1) executed code changed in r14, re-verified oracle-green locally
    "emb_neardup_pairs",
    "dedup_prefix_filter_pairs",
    "dedup_jaccard_threshold_sweep",
    "skyline_parts",
    # (2) weak-by-design tail
    "ann_ivf_top5",
    "semantic_dedup_pairs",
    "stratified_sample_counts",
    "weighted_sample_docs",
    "pack_training_sequences",
    "agg_approx_distinct",
    "appx_percentiles_price",
    "emb_kmeans_clusters",
    "bpe_tokenize_stats",
]


def _reorder(full: dict) -> dict:
    out = {k: full[k] for k in _NEVER_DRIVER_CHECKED if k in full}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    full.update(MEDIAN_QUERIES)
    full.update(PIPELINE_QUERIES)
    full.update(TEMPORAL_QUERIES)
    full.update(TPCH_QUERIES)
    full.update(relational.QUERIES)
    return _reorder(full)


def oracle_sql() -> dict[str, str]:
    full: dict[str, str] = {}
    full.update(MEDIAN_ORACLE)
    full.update(PIPELINE_ORACLE)
    full.update(TEMPORAL_ORACLE)
    full.update(TPCH_ORACLE)
    full.update(relational.ORACLE)
    return _reorder(full)
