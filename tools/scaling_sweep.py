#!/usr/bin/env python
"""Scale-curve evidence for the expensive keys (VERDICT r12 #1): time the
heavy hitters at 1x / 10x / 100x of sf0.1 and fit the cost exponent.

The correctness story already covers 4 SFs; this artifact answers the
remaining 100 TB question — HOW does cost grow? For each key and each SF
point the sweep records warm wall time (min of 2 runs after one unmeasured
warmup) and the cumulative shuffle-write bytes attributed to the runs
(AppStatusStore stage deltas — no Spark UI needed), then fits
log(time) ~ a + b*log(rows): ``b`` is the empirical exponent. b ≈ 1 is
linear, b ≈ 1.2 at these sizes is consistent with n log n + fixed costs;
anything clearly super-linear (b > 1.5 with a clean fit) is a scale bug.

Fixed costs bias b DOWNWARD at small SFs (a key with 2 s of machinery and
1 s of work looks sub-linear), so the exponent is also fitted on the last
two points alone (10x -> 100x), which is the number quoted in
SCALING_r13.md.

Usage:
  python tools/scaling_sweep.py [--keys k1,k2,...] [--out SCALING_r14.json]
SF points (row multipliers vs sf0.1): sf0.1=1x, testdata_scaled/sf1x=10x,
testdata_scaled/sf10x=100x (build with tools/make_scaled_sf.py).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, dir, row multiplier vs sf0.1)
SF_POINTS = [
    ("1x", "/root/testdata/sf0.1", 1),
    ("10x", os.path.join(REPO, "testdata_scaled", "sf1x"), 10),
    ("100x", os.path.join(REPO, "testdata_scaled", "sf10x"), 100),
]

# The VERDICT r12 #1 list: the most expensive operator families, each the
# head of a scale-critical class (banded LSH, prefix-filter join, standing
# index probe, full pipeline, brute/LSH/IVF/PQ ANN, pair-cosine semantic
# dedup, resampling stats, iterative graph), plus two cheap relational
# controls whose known-linear scans anchor the fit.
DEFAULT_KEYS = [
    "dedup_minhash_pairs",
    "dedup_jaccard_threshold_sweep",
    "dedup_incremental_minhash",
    "dedup_simhash_pairs",
    "dedup_exact_docs",
    "llm_corpus_pipeline",
    "ann_cosine_top5",
    "ann_lsh_top5",
    "ann_ivf_fixed_top5",
    "ann_pq_top5",
    "semantic_dedup_fixed_pairs",
    "semantic_dedup_trained_kscaled",
    "stats_bootstrap_ci_price",
    "stats_stratified_bootstrap_ci",
    "graph_pagerank_parts",
    "q1_pricing_summary",
    "join_revenue_by_nation",
    # the r13 batch-2 extension: every remaining pair-generating /
    # self-join key (run via --keys in r13, default since r14)
    "dedup_containment_pairs",
    "dedup_ngram_jaccard_pairs",
    "emb_neardup_pairs",
    "dedup_duplicated_spans",
    "entity_resolution_parts",
    "fuzzy_join_part_names_d2",
    "interval_overlap_pairs",
    "graph_triangle_parts",
    "linkage_best_match",
]


def _extra_builders():
    """Sweep-only measurement harnesses that are not registry keys.

    ``semantic_dedup_trained_kscaled`` (VERDICT r13 #4): the TRAINED
    SemDeDup twin with the codebook grown ∝ corpus — k = n/125 (16 at 1×,
    160 at 10×, 1600 at 100×), the production rule SCALING_r13.md finding 3
    argued bounds within-cluster pair output; this row MEASURES it. The
    registry key ``semantic_dedup_pairs`` keeps its fixed k=16 default
    (its recall pytest contract); scaling k is a deployment parameter, so
    it lives here rather than as a second registry key.
    """
    from rocana_impala_udfs_spark.operators.similarity import semantic_dedup_pairs
    from rocana_impala_udfs_spark.sources.io import load_table

    def semantic_trained_kscaled(spark, d):
        emb = load_table(spark, d, "embeddings")
        nlist = max(16, emb.count() // 125)
        return semantic_dedup_pairs(emb, threshold=0.95, nlist=nlist)

    return {"semantic_dedup_trained_kscaled": semantic_trained_kscaled}


# Keys whose OUTPUT is super-linear by declared semantics, with the largest
# multiplier worth running: semantic dedup against the FIXED frozen
# codebook (8 clusters — the oracle contract) has within-cluster pair
# output that grows quadratically with cluster size, so the 100× point is
# hours of correct-but-uninformative pair emission. At real scale the
# codebook grows with the corpus (the trained `semantic_dedup_pairs` twin
# does exactly that), which bounds cluster sizes and restores linearity —
# the exponent of the FIXED-codebook twin measures the oracle harness, not
# the production design. Recorded in the JSON as `capped_reason`.
MAX_MULT = {"semantic_dedup_fixed_pairs": 10}
CAP_REASON = {
    "semantic_dedup_fixed_pairs": (
        "output quadratic by declared semantics with the FIXED 8-centroid "
        "oracle codebook (pairs within clusters whose size grows with the "
        "corpus); production scales the codebook with the corpus, which "
        "bounds cluster sizes — MEASURED by the "
        "semantic_dedup_trained_kscaled row (k ∝ corpus, VERDICT r13 #4)"
    ),
    # emb_neardup_pairs is no longer capped (r14): make_scaled_sf now maps
    # each replica through its own orthogonal transform, which removed the
    # fixture's C(mult,2) cross-replica epsilon twins — pair output is
    # linear in the multiplier by construction (verified: 360 pairs at
    # 10x, 3960 at 100x, zero cross-replica).
}


def _stage_shuffle_writes(sc) -> dict[int, int]:
    """Per-stage shuffle-write bytes keyed by stageId (AppStatusStore;
    works with spark.ui.enabled=false). Only the LATEST attempt per stage
    counts (ADVICE r15 #3): stageList returns one StageData per
    (stageId, attemptId), and summing attempts would double-count a
    retried stage's failed attempt — exactly the TaskResultLost retry
    class --isolate exists for — inflating the reported shuffle metric."""
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    stages = store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )
    out: dict[int, int] = {}
    attempt: dict[int, int] = {}
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        sid, att = int(s.stageId()), int(s.attemptId())
        if sid not in out or att >= attempt[sid]:
            out[sid] = int(s.shuffleWriteBytes())
            attempt[sid] = att
    return out


def _run_shuffle_bytes(before: dict[int, int], after: dict[int, int]) -> int:
    """Shuffle-write bytes attributable to the stages SUBMITTED between the
    two snapshots (VERDICT r14 #4): the old cumulative-sum delta went
    NEGATIVE whenever AppStatusStore's bounded stage retention evicted
    pre-run stages mid-measurement. Stage IDs are monotone, so summing only
    ids above the pre-run maximum is immune to eviction of older stages;
    eviction of the run's OWN stages is prevented by the sweep session's
    raised spark.ui.retainedStages."""
    floor = max(before, default=-1)
    return sum(b for sid, b in after.items() if sid > floor)


def _fit_exponent(xs: list[float], ys: list[float]) -> float | None:
    """Least-squares slope of log(y) ~ log(x); None if degenerate."""
    pts = [(math.log(x), math.log(y)) for x, y in zip(xs, ys) if y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    if sxx == 0:
        return None
    return sum((p[0] - mx) * (p[1] - my) for p in pts) / sxx


def _run_isolated(keys: list[str], out_path: str, passthrough: list[str]) -> int:
    """--isolate: one fresh JVM per key, results merged into out_path.

    Retires the long-JVM artifact class the r14/r15 sweeps both hit at the
    100× containment point (TaskResultLost: cumulative storage pressure
    from earlier keys' checkpoint blocks evicting an in-flight
    IndirectTaskResult — the same key passes in a fresh JVM). The cost is
    paying session startup per key and losing warm-JVM comparability
    BETWEEN keys; within a key nothing changes (same warmup + min-of-runs
    protocol), so per-key numbers remain comparable to non-isolated runs."""
    import subprocess
    import tempfile

    merged: dict = {}
    rc_any = 0
    for key in keys:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            part = tf.name
        cmd = [sys.executable, os.path.abspath(__file__), "--keys", key,
               "--out", part] + passthrough
        rc = subprocess.call(cmd)
        rc_any |= rc
        try:
            with open(part) as fh:
                merged.update(json.load(fh))
        except Exception:
            merged[key] = {"error": f"isolated run exited {rc} with no output"}
        finally:
            try:
                os.unlink(part)
            except OSError:
                pass
        with open(out_path, "w") as fh:
            json.dump(merged, fh, indent=1)
    print("wrote", out_path, "(isolated)")
    return rc_any


def main() -> int:
    keys = DEFAULT_KEYS
    out_path = os.path.join(REPO, "SCALING_r14.json")
    runs = 2
    mults_filter: set[int] | None = None
    isolate = False
    passthrough: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--keys":
            keys = args.pop(0).split(",")
        elif a == "--out":
            out_path = args.pop(0)
        elif a == "--runs":  # measured runs per point (after 1 warmup)
            runs = int(args.pop(0))
            passthrough += ["--runs", str(runs)]
        elif a == "--mults":  # restrict SF points, e.g. --mults 100
            raw = args.pop(0)
            mults_filter = {int(m) for m in raw.split(",")}
            passthrough += ["--mults", raw]
        elif a == "--isolate":  # one fresh JVM per key (see _run_isolated)
            isolate = True
    if isolate:
        return _run_isolated(keys, out_path, passthrough)
    from rocana_impala_udfs_spark import get_spark
    import __spark_entry__ as entrymod

    # retainedStages raised so the per-stage shuffle snapshot never loses
    # the measured run's own stages to AppStatusStore eviction (VERDICT
    # r14 #4 — the 100× keys submit thousands of stages per point).
    spark = get_spark(
        "scaling-sweep", extra_conf={"spark.ui.retainedStages": "100000"}
    )
    # No initial-partition override here (r13 set 8× manually): the engine
    # now autosizes initialPartitionNum from the scanned directory's bytes
    # inside load_table (VERDICT r13 #1) — the sweep deliberately runs the
    # SHIPPED defaults so a 100× pass proves the self-acting fix, and the
    # per-dir sizing (32 at 1×, ~300 at 100×) stops the old global 8×
    # from inflating the small-SF points' times.
    from rocana_impala_udfs_spark.session import reset_autosize

    sc = spark.sparkContext
    qs = dict(entrymod.queries())
    qs.update(_extra_builders())
    missing = [d for _, d, _ in SF_POINTS if not os.path.isdir(d)]
    if missing:
        print(f"missing SF dirs {missing}: run tools/make_scaled_sf.py first")
        return 1

    results: dict[str, dict] = {}
    for key in keys:
        if key not in qs:
            print(f"skip {key}: not in queries()")
            continue
        row: dict = {"points": {}}
        if key in MAX_MULT:
            row["capped_at_mult"] = MAX_MULT[key]
            row["capped_reason"] = CAP_REASON[key]
        for label, d, mult in SF_POINTS:
            if mult > MAX_MULT.get(key, 10**9):
                break
            if mults_filter is not None and mult not in mults_filter:
                continue
            # each SF point is its own sizing epoch: sticky-max autosizing
            # (ADVICE r14 #1) would otherwise carry the 100× partition
            # count into the NEXT key's 1× point and distort its exponent
            reset_autosize(spark)
            try:
                qs[key](spark, d).collect()  # unmeasured warmup (codegen, caches)
                best, sh = None, 0
                for _ in range(runs):
                    s0 = _stage_shuffle_writes(sc)
                    t0 = time.perf_counter()
                    n_rows = len(qs[key](spark, d).collect())
                    dt = time.perf_counter() - t0
                    s1 = _stage_shuffle_writes(sc)
                    if best is None or dt < best:
                        best, sh = dt, _run_shuffle_bytes(s0, s1)
            except Exception as exc:  # a key failing at scale IS a finding
                row["points"][label] = {"error": f"{type(exc).__name__}: {exc}"[:300],
                                        "mult": mult}
                print(f"{key} @{label}: FAILED {type(exc).__name__}", flush=True)
                break  # larger points would fail the same way
            row["points"][label] = {
                "sec": round(best, 3),
                "shuffle_mb": round(sh / 1e6, 2),
                "rows_out": n_rows,
                "mult": mult,
            }
            print(f"{key} @{label}: {best:.2f}s shuffle={sh/1e6:.1f}MB rows={n_rows}",
                  flush=True)
        # release this key's localCheckpoint blocks before the next key:
        # the ContextCleaner frees them only after the Python frames are
        # GC'd, and 100×-sized checkpoints from one key otherwise crowd
        # the heap under the next key's shuffle (observed: a poisoned JVM
        # failing every later key at 1×)
        import gc

        gc.collect()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass
        # ...and don't stop at GC: unpersist every still-registered block
        # SYNCHRONOUSLY. The r14 full sweep saw a TaskResultLost at the
        # 100× containment point ~24k tasks into the session — storage
        # pressure from prior keys' checkpoint blocks evicting an
        # in-flight IndirectTaskResult block before the driver fetched it
        # (the same key passes at 100× in a fresher JVM). Prior keys'
        # checkpoints are never reused across keys, so blocking unpersist
        # here is safe and makes the storage floor per-key, not cumulative.
        try:
            it = sc._jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(True)
        except Exception:
            pass
        ok_pts = [p for p in row["points"].values() if "sec" in p]
        mults = [p["mult"] for p in ok_pts]
        secs = [p["sec"] for p in ok_pts]
        e_all = _fit_exponent(mults, secs)
        e_tail = _fit_exponent(mults[-2:], secs[-2:])
        row["exponent_all"] = round(e_all, 3) if e_all is not None else None
        row["exponent_tail"] = round(e_tail, 3) if e_tail is not None else None
        results[key] = row
        # flush after every key: a crash/kill mid-sweep keeps the evidence
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)

    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
