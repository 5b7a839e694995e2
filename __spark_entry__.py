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
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-10 order
# (exactly 50 keys): (1) the EIGHT new r10 keys (the tws streaming surface
# + the experimentation/eval/dedup growth keys, none has a driver row);
# (2) the nineteen keys whose VALUES changed in the r10
# final-round-midpoint-class closure (round(avg(x), k) over a quotient →
# exact numerator with a RAW double divide); (3)
# sql_text_monthly_nation_rank (oracle reshaped in r9; latest green row
# r8 — VERDICT r9 #2 front-loads it); (4) value-preserving rework:
# dedup_incremental_minhash (persisted band index — plan changed, values
# identical), the five arrow-UDAF-conversion keys (NaN-parity fix), and
# — from the r10 self-review pass, 4b — the six reservoir-path median
# keys (the two-phase partial now carries an explicit null flag) plus
# the refactored EWMA twin; then (5) the nine weak-by-design keys
# (rows-only is their best evidence; they absorb any over-budget
# truncation harmlessly). Everything else is driver-confirmed hash-green
# on its latest row.
_NEVER_DRIVER_CHECKED = [
    # (1) new r10 keys
    "stream_tws_ewma_user_value",
    "ab_cuped_sequential_peeks",
    "stats_stratified_bootstrap_ci",
    "eval_calibration_ece",
    "ab_srm_check",
    "eval_matryoshka_recall",
    "eval_brier_decomposition",
    "dedup_jaccard_threshold_sweep",
    # (2) value-changed: midpoint-class closure
    "q1_pricing_summary",
    "join_broadcast_brand_prices",
    "conditional_agg",
    "ops_session_health",
    "salted_skew_agg",
    "range_join_value_bands",
    "text_bigram_lm_scores",
    "corpus_length_report",
    "funnel_time_to_convert",
    "multimodal_ppm_decode_stats",
    "multimodal_png_decode_stats",
    "multimodal_jpeg_decode_stats",
    "multimodal_jpeg_progressive_stats",
    "multimodal_jpeg_color_stats",
    "multimodal_feature_extract",
    "multimodal_wav_decode_stats",
    "multimodal_wav_downsample",
    "multimodal_gif_decode_stats",
    "audio_flac_decode_stats",
    # (3) stale-evidence carryover from r9
    "sql_text_monthly_nation_rank",
    # (4) value-preserving rework
    "dedup_incremental_minhash",
    "appx_median_sql_udaf",
    "appx_median_sql_twophase",
    "appx_percentile_sql_udaf",
    "reservoir_sample_quantity",
    "window_median_quantity",
    # (4b) r10 review pass: the two-phase reservoir partial now carries an
    # explicit null flag (NaN-sampling parity with the arrow/JVM paths) —
    # NaN-free fixtures make these value-identical, but the partial's code
    # changed, so re-certify; the tws/EWMA pair shares a refactored
    # final-answer helper (values identical)
    "appx_median_price_global",
    "appx_median_price_by_returnflag",
    "appx_median_totalprice_by_status",
    "appx_median_value_by_event_type",
    "appx_median_value_by_day",
    "appx_p90_value_by_event_type",
    "stream_ewma_user_value",
    # (5) weak-by-design tail
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
