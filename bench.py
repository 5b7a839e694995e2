"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: one shared SparkSession (JVM startup excluded). Each query is
built fresh and fully executed via collect() twice: the first run pays
one-time whole-stage-codegen compilation and Python-worker pool spinup, the
second run is the steady-state cost of the plan itself. ``value``/``queries``
report steady-state (what a warmed cluster does per query); ``cold_value``/
``cold_queries`` keep the first-run numbers for visibility. Headline queries
all have small result sets so collect cost is the query, not the transfer.

Contention-robust extras in the JSON line (VERDICT r12 #2/#7):
``r1_subset_total`` is the stable 21-key r1 pin subset's warm total —
comparable round-over-round even as HEADLINE grows; ``streaming_cost``
decomposes each benched streaming key into {fixed, marginal} (fixed = the
same pipeline timed on the 100×-smaller sf0.001 replay ≈ machinery cost;
marginal = the data-dependent remainder — the number to compare across
rounds); ``contention_flags`` compares every warm value against the newest
committed BENCH_IDLE_r*.json and lists keys >1.5× their idle counterpart,
so a contended official run self-identifies its untrustworthy numbers
(VERDICT r13 #6).

Flags (VERDICT r15 #2/#5): the payload is also written to ``--out`` (default
``BENCH_LOCAL.json`` beside this file, override ``$SPARK_GRAFT_BENCH_OUT``)
BEFORE Spark teardown, and the stdout JSON line is printed AFTER full
teardown (streaming queries stopped, StateStore maintenance pool joined,
``spark.stop()``) so shutdown stderr noise can't truncate it out of a tail
capture. ``--only k1,k2`` restricts the suite; ``--isolate`` runs one fresh
JVM per key as the contention tiebreaker.
"""

from __future__ import annotations

import json
import os
import sys
import time

from rocana_impala_udfs_spark import get_spark

HEADLINE = [
    # The reference's own function, distributed two-phase (scale path).
    "appx_median_price_by_returnflag",
    "appx_median_value_by_event_type",
    # r4: generalized bounded percentile (same protocol, p=0.9)
    "appx_p90_value_by_event_type",
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
    "chunk_dedup_stats",
    "heavy_hitter_tokens",
    "text_quality_scores",
    "ann_cosine_top5",
    # Temporal operators over events (incl. the 4 repaired events queries, r2).
    "asof_click_attribution",
    "tumbling_hourly_event_stats",
    "range_join_value_bands",
    "ops_session_health",
    "appx_median_value_by_day",
    "window_lag_lead_events",
    "events_value_outliers",
    # JVM SimHash (rewritten r2; regression-watch the 60-bit-vote agg).
    "dedup_simhash_pairs",
    # Engine-exclusive operators.
    "skyline_parts",
    "split_train_val_test",
    # Flagship composition: full corpus-prep pipeline.
    "llm_corpus_pipeline",
    # r4 additions: real PNG decode, deterministic samplers, Q21 self-joins,
    # interpolation gap fill, vocabulary report.
    "multimodal_png_decode_stats",
    "stratified_hash_counts",
    "weighted_sample_det_topk",
    "selfjoin_q21_sole_returned_suppliers",
    "interpolated_minute_values",
    "vocab_growth_stats",
    "multimodal_jpeg_decode_stats",
    "chunk_documents_overlap",
    "snapshot_diff_summary",
    "data_quality_report",
    # r5 additions: edit-distance-2 linkage, real color JPEG decode,
    # container-sniffing feature extraction over mixed real codecs.
    "fuzzy_join_part_names_d2",
    "multimodal_jpeg_color_stats",
    "multimodal_feature_extract",
    # r5 session 2: KMV distinct sketch, prefix-filter exact-Jaccard join,
    # BLAS contamination screen, keyed interval self-overlap join.
    "kmv_distinct_users_by_type",
    "dedup_prefix_filter_pairs",
    "dedup_jaccard_threshold_sweep",
    "emb_decontaminate_hits",
    "interval_overlap_pairs",
    # Flagship composition: fuzzy-link + connected components + canonicalize.
    "entity_resolution_parts",
    # Real progressive (SOF2) JPEG decode.
    "multimodal_jpeg_progressive_stats",
    # r5 session 3: trapezoidal time-weighted average, co-purchase triangle
    # counting, Count-Min sketch probe, distinct-value Jaro-Winkler linkage,
    # CDC latest-wins apply, PSI drift screen.
    "events_twa_daily",
    "graph_triangle_parts",
    "sketch_countmin_tokens",
    "linkage_best_match",
    "cdc_apply_latest",
    "quality_psi_price_drift",
    # r5 session 4: portable HLL sketch, logistic quality gate,
    # quality-argmax survivor selection, real Y4M scene-cut detection.
    "sketch_hll_users_by_type",
    "quality_model_scores",
    "quality_pii_report",
    "quality_keep_threshold_sweep",
    "dedup_survivors_best_quality",
    "multimodal_y4m_scene_cuts",
    # Flagship composition: per-source corpus-health dashboard.
    "corpus_source_dashboard",
    # Integer-exact PageRank (iterative graph benchmark).
    "graph_pagerank_parts",
    # Weighted median (the reference's rule generalized), exact bitmap set
    # algebra, int8-quantized ANN, real-decode image retrieval, funnel
    # latency with exact median.
    "exact_weighted_median_price",
    "bitmap_intersect_users",
    "emb_int8_quantized_topk",
    "multimodal_histogram_similarity",
    "funnel_time_to_convert",
    # r6: scalable two-phase SQL median, frozen-table BPE apply (pure JVM
    # fold), literal-hyperplane LSH (now oracle-exact).
    "appx_median_sql_twophase",
    "bpe_apply_stats",
    "ann_lsh_top5",
    # r6: first hash-green COMPRESSED codec (IMA-ADPCM, fold-replay oracle).
    "multimodal_adpcm_decode_stats",
    "ann_ivf_fixed_top5",
    "attribution_multitouch",
    # r6: driver-checked Structured Streaming replay (multi-micro-batch
    # complete-mode sink == batch oracle).
    "stream_daily_event_stats",
    # r6: progressive JPEG AC successive approximation (full 4-scan script).
    "multimodal_jpeg_ac_refine_stats",
    # r6: real LZW (GIF87a) — the dictionary-compression codec family.
    "multimodal_gif_decode_stats",
    # r6: G.711 mu-law as a pure relational codec (whole-stage codegen).
    "audio_mulaw_roundtrip",
    # r6: FLAC subset — predictive coding + Rice entropy codes, CRC/MD5
    # verified on decode.
    "audio_flac_decode_stats",
    # r6: backtested Markov next-event prediction; CUPED A/B readout.
    "markov_predict_eval",
    "ab_cuped_adjusted",
    "epoch_shuffle_plan",
    "join_skew_report",
    # r6: Adam7 interlaced PNG (7-pass sub-image reconstruction).
    "multimodal_png_interlaced_stats",
    # r6: exact selection median (histogram narrowing), Kruskal-Wallis.
    "exact_median_selection",
    "stats_kruskal_price_by_flag",
    "doc_repetition_removal",
    # r7: one-statement JVM-Aggregator SQL median (native partial+final).
    "appx_median_sql_onecall",
    # r7: exact duplicated-span report (word-granular EXACTSUBSTR),
    # PQ-ADC ANN (third family), streaming session-window merge.
    "dedup_duplicated_spans",
    "ann_pq_top5",
    "stream_session_windows",
    "topk_per_group_two_phase",
    "stream_hourly_append_watermark",
    # r7: ANN recall scorecard (runs all three method plans), hybrid RRF,
    # Kendall tau-b grid concordance.
    "ann_recall_report",
    "search_hybrid_rrf_top10",
    "stats_kendall_tau_qty_linenumber",
    # r9: streaming grouped top-k (bounded k-row state, one-sided replay —
    # cheap fixed trigger cost, unlike the two-sided join below), streaming
    # CDC latest-wins view (pure JVM max_by state), streaming EWMA fold
    # (ordered replay), chi-square independence (fixed-order fold).
    "stream_topk_events_per_type",
    "stream_cdc_latest_state",
    "stream_ewma_user_value",
    "ab_chi2_type_by_variant",
    "ab_welch_ttest",
    "emb_pca_project",
    "corpus_source_overlap",
    "stats_bootstrap_ci_price",
    "stats_stratified_bootstrap_ci",
    "ab_ratio_delta_ci",
    # r9 session 2: classifier-eval + governance family (exact AUC / PR
    # curve / kappa / conformal / Gini / MRR / k-anonymity), recursive-CTE
    # month spine. All agg- or k-bounded — cheap adds.
    "eval_auc_doc_length",
    "eval_pr_curve_points",
    "eval_cohens_kappa",
    "eval_calibration_ece",
    "eval_matryoshka_recall",
    "eval_brier_decomposition",
    "eval_conformal_coverage",
    "eval_mrr_report",
    "eval_ndcg_report",
    "corpus_gini_doc_length",
    "privacy_k_anonymity",
    "sql_recursive_month_spine",
    "sql_parameterized_segment",
    "appx_sample_sum_ci",
    "ab_mutual_info_type_variant",
    "ab_sequential_peeks",
    "ab_cuped_sequential_peeks",
    "ab_srm_check",
    "ab_power_mde",
    "ab_cramers_v",
    "dedup_incremental_minhash",
    "stats_mad_price",
    "events_kaplan_meier_conversion",
    "ab_logrank_conversion",
    "events_top_trigram_paths",
    # stream_tws_ewma_user_value: benched since r11 — the vendored protobuf
    # shim makes it run the GENUINE TransformWithStateInPySpark plan, a
    # different operator from the applyInPandasWithState twin.
    # stream_tws_bitmap_map_state / stream_tws_topk_list_state are NOT
    # benched: same fixed replay machinery, and the tws operator cost is
    # already represented by the EWMA key (the r9 promotion discipline).
    "stream_tws_ewma_user_value",
    # stream_tws_lsh_index_candidates / stream_tws_lsh_bounded_bucket are
    # NOT benched: same fixed replay machinery as the other tws keys, and
    # their batch-side cost (md5 banding) is benched through the
    # compaction key below.
    # r12: the index-lifecycle key — first in-process run builds the
    # standing md5-band table and compacts the delta in; warm runs measure
    # the RECOGNIZED path (fingerprint match -> probe only), which is the
    # per-cycle steady state a production service pays.
    "dedup_index_compaction_probe",
    # r12: ORC sink+source — distributed zstd columnar encode of lineitem
    # plus the vectorized read-back and exact agg; the only benched key
    # that measures a WRITE path end to end.
    "io_orc_roundtrip_stats",
    # r13: the JVM reservoir UDAF as a SLIDING analytic (ROWS BETWEEN 9
    # PRECEDING) — a new operator class: WindowExec re-evaluating a typed
    # Aggregator per frame (~1.7 s warm at sf0.1).
    "window_sliding_median_price",
    # stream_join_left_outer_nulls is NOT benched — two-sided join state
    # across triggers, same fixed-cost rationale as the inner interval join.
    # stream_checkpoint_restart_counts is NOT benched — it measures restart
    # machinery (two query startups + checkpoint IO), not an operator.
    # stream_stream_interval_join is deliberately NOT benched: two-sided
    # join state across 4 triggers costs ~15 s at sf0.1 — a fixed
    # streaming-machinery price out of proportion for the suite; its
    # correctness runs in the sf0.01 harness like every other key. The r9
    # sketch-stream promotions (stream_bitmap_distinct_users /
    # stream_kmv_distinct_exact / stream_heavy_hitters_exact) are likewise
    # unbenched: each would add ~3 s of the same fixed replay machinery
    # already represented by the five benched streaming keys;
    # stream_static_enrich_join likewise (stateless join + complete agg —
    # nothing its trigger cost would measure that isn't already covered).
]


# The r1 pin set (BENCH_r01.json / BASELINE.md regression bar): emitting
# this subset's total in every bench line gives the driver's official
# artifact a contention-robust summary — the subset is stable across
# rounds, so its total is comparable round-over-round even as HEADLINE
# grows (VERDICT r12 #7).
R1_STABLE_SUBSET = [
    "agg_order_sizes", "ann_cosine_top5", "appx_median_price_by_returnflag",
    "appx_median_value_by_event_type", "asof_click_attribution",
    "chunk_dedup_stats", "dedup_exact_docs", "dedup_minhash_pairs",
    "heavy_hitter_tokens", "join_broadcast_brand_prices",
    "join_revenue_by_nation", "llm_corpus_pipeline", "ops_session_health",
    "q1_pricing_summary", "range_join_value_bands", "skyline_parts",
    "split_train_val_test", "text_quality_scores", "topk_orders",
    "tumbling_hourly_event_stats", "window_top3_customers_per_nation",
]

# Streaming keys are ~90% fixed cost (query start, state-store open,
# micro-batch scheduling, replay machinery) at bench scale, which lets tws
# startup noise dominate round-over-round comparisons (VERDICT r12 #2).
# For each, the bench decomposes warm time into {fixed, marginal}: fixed is
# the same pipeline timed on the 100×-smaller sf0.001 replay (its per-row
# work is ~1% of the headline run, so its time IS the machinery cost to
# first approximation), marginal = max(warm - fixed, 0) is the data-dependent
# part that actually scales. Compare MARGINAL across rounds; fixed tracks
# machinery, not operators.
STREAMING_KEYS = {
    "stream_daily_event_stats",
    "stream_session_windows",
    "stream_hourly_append_watermark",
    "stream_topk_events_per_type",
    "stream_cdc_latest_state",
    "stream_ewma_user_value",
    "stream_tws_ewma_user_value",
}
FIXED_COST_SF_DIR = os.environ.get(
    "SPARK_GRAFT_FIXED_SF_DIR", "/root/testdata/sf0.001"
)


def _idle_evidence(check_loadavg: bool = True) -> dict:
    """Machine-idleness provenance, embedded in the output JSON (VERDICT r9
    #4): three rounds of official-bench elevation turned out to be
    bench-window CPU contention, not regressions — so every bench line now
    carries the evidence needed to adjudicate that inline. ``idle`` is the
    verdict (1-min loadavg below 25% of the cores AND no foreign running
    process on a CPU); the raw samples ship alongside so a reviewer can
    re-judge. Our own process group (this script + its Spark JVM child) is
    excluded from the foreign-process scan; the post-run sample skips the
    loadavg criterion because our own 32-thread run inflates it. A
    non-idle run still completes — the driver needs its JSON — but prints
    a loud stderr warning and is self-labeled untrustworthy."""
    ncpu = os.cpu_count() or 1
    my_pgrp = os.getpgrp()
    my_pid = os.getpid()

    def _stat(pid: str):
        with open(f"/proc/{pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return parts[0], int(parts[1]), int(parts[2])  # state, ppid, pgrp

    # Our own descendants by ppid walk, not just process-group equality: a
    # JVM launched via setsid lands in a different pgrp and would otherwise
    # self-flag the bench as not idle (ADVICE r10 #5).
    def _descendants() -> set:
        mine = {my_pid}
        changed = True
        while changed:
            changed = False
            for pid in os.listdir("/proc"):
                if not pid.isdigit() or int(pid) in mine:
                    continue
                try:
                    _, ppid, _ = _stat(pid)
                except (OSError, IndexError, ValueError):
                    continue
                if ppid in mine:
                    mine.add(int(pid))
                    changed = True
        return mine

    loadavgs: list[float] = []
    competing: list[str] = []
    for _ in range(3):  # three samples 0.2 s apart: catch bursty competitors
        # re-read loadavg AND the descendant walk per sample: a descendant
        # spawned mid-loop (fresh Python worker under a setsid JVM) must not
        # be misread as a competitor
        mine = _descendants()
        loadavgs.append(os.getloadavg()[0])
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                state, _ppid, pgrp = _stat(pid)
                with open(f"/proc/{pid}/comm") as fh:
                    comm = fh.read().strip()
            except (OSError, IndexError, ValueError):
                continue
            # 'R' = on a CPU right now; skip our own group AND descendants
            # AND kernel threads (pgrp 0 — e.g. rcu_preempt, which briefly
            # runs after our own 32-thread burst and is not a competitor)
            if state == "R" and pgrp not in (0, my_pgrp) and int(pid) not in mine:
                tag = f"{pid}:{comm}"
                if tag not in competing:
                    competing.append(tag)
        time.sleep(0.2)
    loadavg = [max(loadavgs)] + list(os.getloadavg())[1:]
    idle = (not check_loadavg or loadavg[0] < 0.25 * ncpu) and not competing
    if not idle:
        print(
            f"bench: MACHINE NOT IDLE (loadavg={loadavg}, competing={competing}) — "
            "timings untrustworthy, rerun on an idle machine",
            file=sys.stderr,
        )
    return {"idle": idle, "loadavg": [round(x, 2) for x in loadavg], "competing": competing}


def _idle_reference() -> tuple[str | None, dict[str, float]]:
    """Per-query warm times from the newest committed BENCH_IDLE_r*.json
    (override: $SPARK_GRAFT_IDLE_REF). The driver's official bench windows
    have repeatedly been CPU-contended (VERDICT r9 #4, r12 #7, r13 #3);
    comparing each warm value against its idle counterpart lets a
    contaminated run SELF-IDENTIFY its outliers in the JSON line instead
    of leaving the judge to cross-reference artifacts by hand."""
    import glob
    import re

    ref = os.environ.get("SPARK_GRAFT_IDLE_REF")
    if not ref:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = glob.glob(os.path.join(here, "BENCH_IDLE_r*.json"))

        def rnum(p: str) -> int:
            m = re.search(r"BENCH_IDLE_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        ref = max(cands, key=rnum) if cands else None
    if not ref or not os.path.isfile(ref):
        return None, {}
    try:
        with open(ref) as fh:
            data = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return ref, {}
    return os.path.basename(ref), {
        k: float(v) for k, v in data.get("queries", {}).items()
    }


def _teardown(spark) -> None:
    """Stop everything noisy BEFORE the payload prints (VERDICT r15 #2).

    The driver's BENCH_r15.json lost its payload: state-store maintenance
    threads racing ``sc.stop()`` dumped RpcEnvStoppedException stacktraces
    over stderr at process exit, and the driver's tail capture truncated
    the JSON line out. Fix: stop every active streaming query, stop the
    StateStore maintenance pool explicitly, stop Spark — and only THEN
    print the payload, so it is the final stdout line after all shutdown
    noise has already been emitted."""
    try:
        for q in spark.streams.active:
            try:
                q.stop()
                q.awaitTermination(30)
            except Exception:
                pass
    except Exception:
        pass
    try:
        # public Spark class; unloads providers and joins the maintenance
        # thread pool whose shutdown race produced the r15 stderr wall
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass
    try:
        spark.stop()
    except Exception:
        pass


def _run_isolated(keys: list[str], out_path: str) -> None:
    """--isolate: one fresh JVM per key (VERDICT r15 #5), merged payload.

    Same rationale as tools/scaling_sweep.py --isolate: a long shared JVM
    accumulates storage pressure that can contaminate late keys' numbers;
    when contention_flags fire on a warm-suite run, this mode is the
    tiebreaker. Per-key protocol is unchanged (cold + min-of-2 warm), so
    per-key numbers stay comparable to the warm-suite run; only the
    shared-JVM warmth BETWEEN keys differs."""
    import subprocess
    import tempfile

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    streaming_cost: dict[str, dict] = {}
    errors: dict[str, str] = {}
    sf = None
    for key in keys:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            part = tf.name
        cmd = [sys.executable, os.path.abspath(__file__), "--only", key,
               "--out", part, "--no-idle-check"]
        rc = subprocess.call(cmd, stdout=subprocess.DEVNULL)
        try:
            with open(part) as fh:
                p = json.load(fh)
            warm.update(p.get("queries", {}))
            cold.update(p.get("cold_queries", {}))
            streaming_cost.update(p.get("streaming_cost", {}))
            sf = p.get("sf", sf)
        except Exception:
            errors[key] = f"isolated run exited {rc} with no payload"
        finally:
            try:
                os.unlink(part)
            except OSError:
                pass
    idle_ref_name, idle_q = _idle_reference()
    contention_flags = {
        k: {"warm": warm[k], "idle": idle_q[k], "ratio": round(warm[k] / idle_q[k], 2)}
        for k in warm
        if k in idle_q and idle_q[k] > 0 and warm[k] > 1.5 * idle_q[k]
        and max(warm[k], idle_q[k]) >= 0.3
    }
    payload = {
        "metric": "headline_suite_total",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": sf,
        "r1_subset_total": round(
            sum(warm[k] for k in R1_STABLE_SUBSET if k in warm), 3
        ),
        "streaming_cost": streaming_cost,
        "idle_ref": idle_ref_name,
        "contention_flags": contention_flags,
        "n_contention_flags": len(contention_flags),
        "isolated": True,
        "errors": errors,
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))
    sys.stdout.flush()


def main() -> None:
    args = sys.argv[1:]
    only: list[str] | None = None
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    isolate = False
    idle_check = True
    while args:
        a = args.pop(0)
        if a == "--only":  # restrict to a comma-separated key subset
            only = args.pop(0).split(",")
        elif a == "--out":  # also write the payload here (survives any
            out_path = args.pop(0)  # stdout truncation by the caller)
        elif a == "--isolate":  # one fresh JVM per key (see _run_isolated)
            isolate = True
        elif a == "--no-idle-check":  # child runs: parent already sampled
            idle_check = False
        else:
            raise SystemExit(f"bench: unknown arg {a!r}")
    keys = [k for k in HEADLINE if only is None or k in only]
    if isolate:
        _run_isolated(keys, out_path)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idle_before = _idle_evidence() if idle_check else {"idle": None}
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    except ValueError:
        sf = None  # custom dir name; bench still runs and emits its JSON line
    spark = get_spark("rocana-bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # The r1 pin subset must stay fully benched: a key renamed or dropped
    # from HEADLINE would silently shrink r1_subset_total and read as a
    # round-over-round speedup (ADVICE r13 #1). Fail loudly instead.
    missing_pin = sorted(set(R1_STABLE_SUBSET) - set(HEADLINE)) if only is None else []
    if missing_pin:
        raise SystemExit(
            f"bench: r1 pin subset keys missing from HEADLINE: {missing_pin} — "
            "r1_subset_total would silently shrink; restore them"
        )
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in keys:
        if name not in qs:
            continue
        start = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - start, 3)
        # Steady state = min of two warmed runs; a single warm run still
        # wobbles ±20% from GC/scheduler noise at this scale.
        runs = []
        for _ in range(2):
            start = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - start)
        warm[name] = round(min(runs), 3)
    # second half of the pin-subset guard: a pin key present in HEADLINE but
    # absent from queries() is skipped by the loop above and would shrink
    # the subset total just as silently
    missing_warm = sorted(set(R1_STABLE_SUBSET) - set(warm)) if only is None else []
    if missing_warm:
        raise SystemExit(
            f"bench: r1 pin subset keys not benched (absent from queries()): "
            f"{missing_warm}"
        )
    # streaming fixed/marginal decomposition (see STREAMING_KEYS comment)
    streaming_cost: dict[str, dict[str, float]] = {}
    if os.path.isdir(FIXED_COST_SF_DIR):
        for name in keys:
            if name not in STREAMING_KEYS or name not in warm:
                continue
            # unmeasured warmup first: the first run at this sf dir pays
            # one-time replay-dir writes + codegen that are NOT machinery
            # cost and would overstate `fixed`
            qs[name](spark, FIXED_COST_SF_DIR).collect()
            start = time.perf_counter()
            qs[name](spark, FIXED_COST_SF_DIR).collect()
            fixed = round(time.perf_counter() - start, 3)
            streaming_cost[name] = {
                "fixed": fixed,
                "marginal": round(max(warm[name] - fixed, 0.0), 3),
            }
    # contention self-flagging (VERDICT r13 #6): any warm value >1.5× its
    # committed-idle counterpart is listed, with the ratio, so a contended
    # official run names its own untrustworthy per-query numbers. Flags on
    # sub-0.3 s keys are suppressed — at that magnitude the 1.5× band is
    # inside scheduler jitter, not contention evidence.
    idle_ref_name, idle_q = _idle_reference()
    contention_flags = {
        k: {"warm": warm[k], "idle": idle_q[k], "ratio": round(warm[k] / idle_q[k], 2)}
        for k in warm
        if k in idle_q and idle_q[k] > 0 and warm[k] > 1.5 * idle_q[k]
        and max(warm[k], idle_q[k]) >= 0.3
    }
    payload = {
        "metric": "headline_suite_total",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": sf,
        # contention-robust summaries (VERDICT r12 #7): the r1 pin
        # subset is stable across rounds, and warm values are
        # already min-over-2-runs per key
        "r1_subset_total": round(
            sum(warm[k] for k in R1_STABLE_SUBSET if k in warm), 3
        ),
        "streaming_cost": streaming_cost,
        "idle_ref": idle_ref_name,
        "contention_flags": contention_flags,
        "n_contention_flags": len(contention_flags),
        "idle_before": idle_before,
        "idle_after": _idle_evidence(check_loadavg=False) if idle_check
        else {"idle": None},
    }
    # Payload durability (VERDICT r15 #2): write the file FIRST, then tear
    # Spark all the way down, then print the JSON as the process's final
    # stdout line — shutdown noise lands on stderr before it, so a caller's
    # tail capture can no longer truncate the payload away.
    try:
        with open(out_path, "w") as fh:
            fh.write(json.dumps(payload) + "\n")
    except OSError as exc:
        print(f"bench: could not write {out_path}: {exc}", file=sys.stderr)
    _teardown(spark)
    print(json.dumps(payload))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
