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
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-7 order:
# (1) the three keys whose semantics/plan changed this round (BPE fold
# symbol-boundary fix; the reworked pushdown-friendly selection median;
# CUPED's decimal accumulation) plus the four NEW r7 keys (one-statement
# JVM-Aggregator SQL median, duplicated-span dedup, PQ ANN, streaming
# session windows, append-mode watermark finalization, two-phase salted
# grouped top-k, ANN recall scorecard, hybrid RRF search), (2) the 38 keys
# that have never received a driver row across r01-r06 (all green on the
# local full harness), then (3) the nine weak-by-design keys (rows-only is
# their best possible evidence; they already carry driver rows, so they
# absorb any over-budget truncation harmlessly). Everything else is
# already driver-confirmed hash-green on its latest row.
_NEVER_DRIVER_CHECKED = [
    "bpe_apply_stats",
    "exact_median_selection",
    "ab_cuped_adjusted",
    "appx_median_sql_onecall",
    "dedup_duplicated_spans",
    "ann_pq_top5",
    "stream_session_windows",
    "topk_per_group_two_phase",
    "stream_hourly_append_watermark",
    "ann_recall_report",
    "search_hybrid_rrf_top10",
    "stats_kendall_tau_qty_linenumber",
    "stream_stream_interval_join",
    "shard_manifest_stats",
    "curriculum_budget_selection",
    "corpus_source_dashboard",
    "exact_weighted_median_price",
    "stats_acf_daily",
    "events_changepoint_daily",
    "events_peak_concurrency",
    "events_duration_log2_buckets",
    "source_vocab_overlap",
    "events_conversion_wilson_ci",
    "emb_centroid_microunits",
    "sql_text_monthly_nation_rank",
    "emb_int8_quantized_topk",
    "multimodal_histogram_similarity",
    "exact_weighted_p90_quantity",
    "stats_gini_order_values",
    "notin_null_semantics_probe",
    "events_iqr_outliers",
    "window_rank_semantics_probe",
    "join_cardinality_estimate",
    "label_churn_features",
    "pit_feature_join",
    "split_leakage_audit",
    "resample_class_balance",
    "negative_sampling_pairs",
    "stats_median_ci_price",
    "forecast_mase_seasonal_naive",
    "text_readability_scores",
    "pack_nextfit_stats",
    "events_user_drawdown",
    "ops_rate_limiter_sim",
    "sample_exact_k_per_type",
    "stats_quantile_bands_price",
    "graph_components_parts",
    "events_cumulative_distinct_users",
    "search_bm25_top10",
    "quantile_normalize_price",
    "histogram_price_qty_2d",
    # r7 scale-rework keys whose VALUES are unchanged (verified locally):
    # their existing driver-green rows remain valid for the old code and
    # the local harness covers the new code, so they rank after the
    # never-checked backlog but before the weak tail.
    "stats_kruskal_price_by_flag",
    "stats_mannwhitney_price_halves",
    "stats_spearman_price_quantity",
    "funnel_time_to_convert",
    "join_skew_report",
    "cdc_apply_latest",
    "llm_corpus_pipeline",
    "dedup_survivors_best_quality",
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
