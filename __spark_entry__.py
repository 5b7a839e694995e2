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
# budget (~50 keys/round), so the front is scheduled, not arbitrary.
# STANDING RULE (VERDICT r15 #6 — age-based rotation): each round the
# front lists, in order, (1) keys NEW or with changed executed code this
# round, then (2) the keys whose latest driver-checked row is OLDEST
# across the CORRECTNESS_r* union, oldest first, enough to fill the ~50
# budget — so no green row ages past ~10 rounds — then (3) the
# weak-by-design keys (rows-only is their best evidence; they absorb any
# over-budget truncation harmlessly). Recompute (2) each round from the
# committed CORRECTNESS_r*.json artifacts (max round per key).
#
# Round-16 front (every key entered r16 hash-green on its latest row —
# VERDICT r15: 334/334 oracle keys green across the r1–r15 union):
_NEVER_DRIVER_CHECKED = [
    # (1) NEW in r16: the foreachBatch last-writer-wins merge twins of the
    # two complete-mode certification keys (VERDICT r15 #4) — update-mode
    # deltas upserted into a keyed target, same oracles as their twins
    "stream_cdc_latest_merge",
    "stream_topk_events_merge",
    "stream_cdc_user_day_merge",
    # NEW in r16: the governance family's DP + l-diversity members —
    # deterministic content-addressed Laplace draw (oracle-replayable),
    # and the k-anonymity companion over the same QI frame
    "privacy_dp_histogram",
    "privacy_l_diversity",
    # renamed in r16 (ADVICE r15 #4): same plan as r15's hash-green
    # join_anti_customers_without_orders, key now matches the semantics
    "join_anti_customers_without_urgent_orders",
    # (2) oldest driver rows first: the 26 keys last checked in r1, then
    # the 18 last checked in r3 (alphabetical within a round)
    "agg_argmax_orders",
    "agg_exact_distinct",
    "agg_order_sizes",
    "array_vector_stats",
    "cube_lineitem",
    "distinct_segments",
    "fuzzy_join_part_names",
    "grouping_sets_orders",
    "having_big_parts",
    "join_left_customer_order_counts",
    "join_q5_local_supplier_volume",
    "join_semi_customers_with_orders",
    "map_status_counts",
    "merge_upsert_balances",
    "q6_forecast_revenue",
    "rollup_orders",
    "scalar_date_functions",
    "scalar_string_math",
    "setop_intersect_nations",
    "setop_union_names",
    "subquery_above_avg_customers",
    "topk_orders",
    "unpivot_lineitem_measures",
    "window_ntile_order_deciles",
    "window_running_spend",
    "window_top3_customers_per_nation",
    "chunk_dedup_stats",
    "decontaminate_docs",
    "heavy_hitter_tokens",
    "lang_id_counts",
    "multimodal_frame_fingerprints",
    "multimodal_media_catalog",
    "multimodal_ppm_resize",
    "multimodal_resize",
    "repetition_scores",
    "split_train_val_test",
    "text_collocations_pmi",
    "text_fingerprints",
    "text_pii_flags",
    "text_quality_scores",
    "text_token_counts",
    "text_top_bigrams",
    "tfidf_top_terms",
    "udtf_lateral_shingles",
    # (3) weak-by-design tail (ann_ivf_top5's executed code changed in
    # r16 — nprobe 4→8 — but it stays in the weak tail: rows-only is
    # still its strongest driver evidence; the recall band moved to
    # >=0.7 in tools/weak_evidence.py with the pytest anchor re-run)
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
