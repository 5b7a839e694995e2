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
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-12 order
# (every key entered r12 with a hash-green latest driver row — VERDICT
# r11: 322/322 oracle keys green across the r1-r11 union — so the front
# is just r12's changes per the standing contract): (1) the NINE new
# r12 keys — the bounded-bucket streaming LSH index (cap + overflow
# markers; VERDICT r11 #1a), the index-compaction probe-equality key
# (VERDICT r11 #1b), the bounded-handoff recall-union, the ORC
# round-trip, one-way ANOVA, the frozen-codebook SemDeDup twin, the
# exactly-once append file sink, and the two IO-hardening keys (schema
# evolution on append, corrupt-record tolerance); (2) keys whose EXECUTED CODE changed in r12 with values
# pinned identical on the ordered replay: the unbounded streaming LSH key
# (pair orientation now normalized to (min,max) inside the processor —
# ADVICE r11) and the tws EWMA key (progress capture added for the
# RocksDB-provider pin); then (3) the nine weak-by-design keys
# (rows-only is their best evidence; they absorb any over-budget
# truncation harmlessly).
_NEVER_DRIVER_CHECKED = [
    # (1) new r12 keys
    "stream_tws_lsh_bounded_bucket",
    "dedup_index_compaction_probe",
    "dedup_bounded_handoff_union",
    "io_orc_roundtrip_stats",
    "ab_anova_value_by_type",
    "semantic_dedup_fixed_pairs",
    "stream_append_sink_exactly_once",
    "io_schema_evolution_stats",
    "io_corrupt_records_stats",
    # (1b) executed code changed in the r12 second-pass review (values
    # pinned identical): skyline's fan-in estimate is now plan-side (no
    # job on shuffle-fed inputs), and the handoff-union ranks the
    # COMPACTED table instead of re-banding the corpus
    "skyline_parts",
    # (2) executed code or oracle text changed in r12, values pinned
    # identical: the LSH keys (pair normalization / progress capture),
    # emb_neardup_pairs (Arrow bucket kernel + ids-only dedup,
    # bit-identical results), and ab_sequential_peeks (oracle variance
    # numerator VARCHAR-routed after the sf0.001 sweep caught a low-bit
    # z flip — the r10 HUGEINT->DOUBLE class)
    "stream_tws_lsh_index_candidates",
    "stream_tws_ewma_user_value",
    "emb_neardup_pairs",
    "ab_sequential_peeks",
    # ... and the sf1x-sweep hardening commits: BIG_K 1M->10M (every
    # BIG_K-parameterized median/percentile/reservoir key — unsaturated
    # regime unchanged at sf0.01, values pinned identical), the tws
    # median cap 30k->1M, and the CUPED degenerate-covariate NULL guard
    # (spark + oracle changed together)
    "appx_median_price_global",
    "appx_median_price_by_returnflag",
    "appx_median_totalprice_by_status",
    "appx_median_value_by_event_type",
    "appx_median_value_by_day",
    "appx_median_sql_udaf",
    "appx_median_sql_onecall",
    "appx_median_sql_twophase",
    "appx_p90_value_by_event_type",
    "appx_percentile_sql_udaf",
    "window_median_quantity",
    "reservoir_sample_quantity",
    "stream_tws_median_value",
    "ab_cuped_sequential_peeks",
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
