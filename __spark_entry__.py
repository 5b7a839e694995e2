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
# budget (~50 keys/round), so keys that have never had a driver oracle row
# (union of CORRECTNESS_r01..r03) go FIRST — the r3-fixed temporal family,
# the TPC-H pack, then every round-4 addition (this round's deliverable gets
# driver evidence), then the remaining never-checked temporal/statistical
# keys — and the keys the driver already confirmed green form the tail.
_NEVER_DRIVER_CHECKED = [
    "asof_click_attribution",
    "sessionize_events",
    "ops_session_health",
    "window_trailing_7d_user_value",
    "tumbling_hourly_event_stats",
    "multi_resolution_rollup",
    "gap_filled_minute_counts",
    "sliding_window_event_rates",
    "exists_q4_order_priority",
    "join_q7_nation_volume",
    "join_q8_market_share",
    "join_q9_profit_by_nation_year",
    "join_q10_returned_items",
    "conditional_q14_promo_share",
    "in_q18_large_volume_customers",
    "disjunct_q19_discounted_revenue",
    "notexists_q22_idle_customers",
    "case_q12_priority_shipping",
    "view_q15_top_supplier",
    "distinct_q16_supplier_breadth",
    "nestedin_q20_promo_part_suppliers",
    "multimodal_png_decode_stats",
    "multimodal_ppm_feature_histogram",
    "stratified_hash_counts",
    "weighted_sample_det_topk",
    "corrmin_q2_min_price_supplier",
    "share_q11_important_parts",
    "outeragg_q13_order_count_distribution",
    "selfjoin_q21_sole_returned_suppliers",
    "appx_p90_value_by_event_type",
    "appx_percentile_sql_udaf",
    "ewma_user_value",
    "interpolated_minute_values",
    "vocab_growth_stats",
    "multimodal_jpeg_decode_stats",
    "chunk_documents_overlap",
    "snapshot_diff_summary",
    "data_quality_report",
    "events_wow_seasonality",
    "asof_click_attribution_30m",
    "events_seasonal_anomalies",
    "funnel_view_click_purchase",
    "retention_weekly_cohorts",
    "variant_props_stats",
    "json_event_props_stats",
    "salted_skew_agg",
    "pivot_daily_event_counts",
    "range_join_value_bands",
    "histogram_price_bins",
    "histogram_price_equidepth",
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
