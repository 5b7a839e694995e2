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
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-15 order
# (every key entered r15 with a hash-green latest driver row — VERDICT
# r14: 332/332 oracle keys green across the r1-r14 union): (1) the three
# formerly-VACUOUS gates rebuilt per VERDICT r14 #1 so they hash-match on
# NONZERO rows — emb_neardup_pairs_loose is NEW (bounded id<200
# brute-force at threshold 0.35, 42 rows at sf0.01: the key that now
# certifies the Arrow pair-cosine kernel's actual doubles against DuckDB
# list_cosine_similarity; the production-threshold emb_neardup_pairs key
# keeps its 0.95 semantics and its 0-row fixture reality), and the
# anti-join/except keys now difference against restricted subsets
# (URGENT orders; 9500+-balance suppliers) that provably leave rows.
# (2) keys whose EXECUTED CODE changed in r15: the two prefix-filter
# keys (verify ni/nj now derive from the collected sets themselves,
# ADVICE r14 #4 — same values on distinct input, locally re-verified
# oracle-green). Then (3) the nine weak-by-design keys (rows-only is
# their best evidence; they absorb any over-budget truncation
# harmlessly).
_NEVER_DRIVER_CHECKED = [
    # (0) brand-new in r15: append-mode (production-shape) session
    # windows — merging-window finalization + eviction, oracle-exact on
    # the ordered replay with the end<=watermark boundary pinned by a
    # synthetic end==watermark experiment
    "stream_session_windows_append",
    # (1) formerly-vacuous gates, now nonzero-row by construction
    "emb_neardup_pairs_loose",
    "join_anti_customers_without_orders",
    "setop_except_nations",
    # (2) executed code changed in r15, re-verified oracle-green locally
    "dedup_prefix_filter_pairs",
    "dedup_jaccard_threshold_sweep",
    # (3) weak-by-design tail
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
