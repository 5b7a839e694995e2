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
# budget (~50 keys/round), so the UNPROVEN set goes first. Round-9 order:
# (1) the NEW r9 keys — none has a driver row yet: the session-2 additions
# (classifier-eval family: AUC / PR curve / kappa / conformal / MRR / nDCG;
# governance: k-anonymity / Benford; robust stats: MAD / Gini / mutual
# information; survival: Kaplan–Meier / log-rank; paths: trigram top-10;
# SQL surface: recursive month spine; streaming: left-outer join null
# rows), then the session-1 additions (stream-static broadcast join, Welch
# t-test, ratio-metric delta CI, bootstrap CI, PCA projection, source
# overlap, streaming grouped top-k / CDC / EWMA / sketch promotions,
# chi-square); (2) the two stale-evidence keys VERDICT r8 front-loaded
# (appx_median_sql_onecall — its r7 row predates the NaN-policy jar
# change; funnel_time_to_convert — stats collect relocated to
# operators/selection this round); (3) the nine float-sum-sweep keys whose
# aggregation switched to exact DECIMAL/HUGEINT moments this round;
# (4) sql_text_monthly_nation_rank (oracle reshaped, values unchanged);
# then (5) the nine weak-by-design keys (rows-only is their best evidence;
# they absorb any over-budget truncation harmlessly). Everything else is
# driver-confirmed hash-green on its latest row.
_NEVER_DRIVER_CHECKED = [
    "stream_checkpoint_restart_counts",
    "stream_rocksdb_state_counts",
    "stream_join_left_outer_nulls",
    "sql_recursive_month_spine",
    "sql_parameterized_segment",
    "appx_sample_sum_ci",
    "events_kaplan_meier_conversion",
    "ab_logrank_conversion",
    "events_top_trigram_paths",
    "stats_mad_price",
    "ab_mutual_info_type_variant",
    "ab_sequential_peeks",
    "ab_power_mde",
    "ab_cramers_v",
    "eval_mrr_report",
    "eval_ndcg_report",
    "corpus_gini_doc_length",
    "eval_conformal_coverage",
    "dedup_incremental_minhash",
    "eval_auc_doc_length",
    "eval_pr_curve_points",
    "eval_cohens_kappa",
    "privacy_k_anonymity",
    "stream_static_enrich_join",
    "ab_welch_ttest",
    "emb_pca_project",
    "corpus_source_overlap",
    "stats_bootstrap_ci_price",
    "ab_ratio_delta_ci",
    "stream_topk_events_per_type",
    "stream_bitmap_distinct_users",
    "stream_kmv_distinct_exact",
    "stream_heavy_hitters_exact",
    "stream_cdc_latest_state",
    "stream_ewma_user_value",
    "ab_chi2_type_by_variant",
    "stream_dedup_within_watermark",
    "tumbling_hourly_event_stats",
    "sliding_window_event_rates",
    "appx_median_sql_onecall",
    "funnel_time_to_convert",
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "join_q3_shipping_priority",
    "subquery_q17_small_qty_revenue",
    "stats_price_quantity",
    "winsorized_stats_price",
    "events_value_outliers",
    "ab_cuped_adjusted",
    "zipf_token_fit",
    "sql_text_monthly_nation_rank",
    # weak-by-design tail:
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
