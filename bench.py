"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: one shared SparkSession (JVM startup excluded); each query is
built fresh and fully executed via collect(); headline queries all have
small result sets so collect cost is the query, not the transfer.
"""

from __future__ import annotations

import json
import os
import time

from rocana_impala_udfs_spark import get_spark

HEADLINE = [
    # The reference's own function, distributed two-phase (scale path).
    "appx_median_price_by_returnflag",
    "appx_median_value_by_event_type",
    # Relational coverage: scan+agg, multi-join, broadcast join, top-k, window.
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "join_broadcast_brand_prices",
    "topk_orders",
    "window_top3_customers_per_nation",
    "agg_order_sizes",
    # LLM-pipeline operators (added as implemented).
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "text_quality_scores",
    "ann_cosine_top5",
    # Temporal operators over events.
    "asof_click_attribution",
    "tumbling_hourly_event_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("rocana-bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        start = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - start, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
