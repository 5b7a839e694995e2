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
# budget (~50 keys/round), so the UNPROVEN set goes first. After round 4
# the unproven set is: the 2 keys whose r4 hash mismatch was fixed this
# round (un-cast oracle sums — DuckDB HUGEINT vs Spark BIGINT), the 2 keys
# whose latest driver row is a stale round-1 error (pre-NTZ-fix; an `err`
# row counts as unchecked), the 17 keys past round 4's 50-key truncation,
# and the 2 round-4 additions that were missing from this list, then every
# round-5 addition. The ~46 keys CORRECTNESS_r04 confirmed green moved to
# the tail.
_NEVER_DRIVER_CHECKED = [
    # r4 hash mismatches, oracle CAST fixed this round
    "case_q12_priority_shipping",
    "pivot_daily_event_counts",
    # stale round-1 `err` rows (TIMESTAMP_NTZ read, fixed r4, never re-run)
    "window_lag_lead_events",
    "events_value_outliers",
    # never driver-checked (past r4's truncation point)
    "events_transition_matrix",
    "ops_error_burn_rate",
    "events_dau_wau",
    "stats_spearman_price_quantity",
    "window_revenue_share_by_nation",
    "window_rolling_p90_totalprice",
    "events_mad_outliers",
    "winsorized_stats_price",
    "basket_part_pairs",
    "profile_lineitem_columns",
    "events_path_patterns",
    "customer_rfm_segments",
    "revenue_share_of_region",
    "skyline_parts",
    "emb_kmeans_assign",
    "emb_kmeans_clusters",
    "resample_by_quality",
    # r4 additions that were missing from this rotation entirely
    "dedup_containment_pairs",
    "ops_daily_digest",
    # round-5 additions
    "fuzzy_join_part_names_d2",
    "multimodal_jpeg_color_stats",
    # promoted from rows-only (fake decoder) to oracle-checked (real codecs)
    "multimodal_feature_extract",
    "multimodal_wav_decode_stats",
    "multimodal_y4m_frame_sample",
    "bpe_tokenize_stats",
    # round-5 additions (session 2): KMV sketch family, Benford DQ screen,
    # prefix-filter exact-Jaccard join
    "kmv_distinct_users_by_type",
    "kmv_merged_weekly_users",
    "quality_benford_prices",
    "dedup_prefix_filter_pairs",
    "emb_decontaminate_hits",
    "zorder_part_keys",
    "interval_overlap_pairs",
    "zipf_token_fit",
    "kmv_user_overlap_estimate",
    "stats_trend_by_event_type",
    "stats_chi2_type_dow",
    "entity_resolution_parts",
    "multimodal_jpeg_progressive_stats",
    "incremental_agg_merge",
    "scd2_user_type_history",
    "graph_copurchase_hops",
    "window_first_last_orders",
    "null_semantics_probe",
    # round-5 additions (session 3) — after the longer-waiting keys above,
    # so a 50-key driver truncation still clears the backlog first
    "events_twa_daily",
    "events_cusum_daily",
    "sampling_systematic_events",
    "graph_triangle_parts",
    "stats_theilsen_trend",
    "quality_psi_price_drift",
    "quality_k_anonymity",
    "text_pii_redact",
    "index_token_postings",
    "sketch_countmin_tokens",
    "linkage_best_match",
    "cdc_apply_latest",
    "bloom_semi_orders",
    "stats_rolling_corr_click_view",
    "events_holt_daily",
    "basket_rules_lift",
    "graph_clustering_coeff",
    "stats_ks_price_halves",
    "events_longest_streak",
    # round-5 additions (session 4)
    "sketch_hll_users_by_type",
    "quality_model_scores",
    "mix_sources_budget",
    "dedup_survivors_best_quality",
    "events_seasonal_decompose",
    "multimodal_wav_downsample",
    "multimodal_y4m_scene_cuts",
    "graph_pagerank_parts",
    "funnel_time_to_convert",
    "shard_manifest_stats",
    "curriculum_budget_selection",
    "corpus_source_dashboard",
    "exact_weighted_median_price",
    "stats_acf_daily",
    "events_changepoint_daily",
    "bitmap_intersect_users",
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
    "stats_mannwhitney_price_halves",
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
