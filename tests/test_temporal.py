"""Temporal operators (as-of join, sessionize, tumbling agg) plus sketch
aggregates — semantic edge cases the sf0.01 oracle harness can't isolate."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.operators.temporal import as_of_join, sessionize, tumbling_agg
from rocana_impala_udfs_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:05:00"), 101.0),
            (1, _ts("2024-01-01T11:00:00"), 102.0),
            (2, _ts("2024-01-01T10:30:00"), 200.0),
        ],
        "key long, ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:59:00")),  # before any quote -> null
            (1, _ts("2024-01-01T10:05:00")),  # exactly at quote -> 101 (<= semantics)
            (1, _ts("2024-01-01T10:59:59")),  # between -> 101
            (1, _ts("2024-01-01T12:00:00")),  # after last -> 102
            (2, _ts("2024-01-01T10:31:00")),  # other key -> 200
            (3, _ts("2024-01-01T10:31:00")),  # key with no quotes -> null
        ],
        "key long, ts timestamp",
    )


def test_asof_join_semantics(quotes, trades):
    out = {
        (r.key, r.ts.isoformat()): r.asof_px
        for r in as_of_join(trades, quotes, ["key"], "ts", ["px"]).collect()
    }
    assert out[(1, "2024-01-01T09:59:00")] is None
    assert out[(1, "2024-01-01T10:05:00")] == 101.0
    assert out[(1, "2024-01-01T10:59:59")] == 101.0
    assert out[(1, "2024-01-01T12:00:00")] == 102.0
    assert out[(2, "2024-01-01T10:31:00")] == 200.0
    assert out[(3, "2024-01-01T10:31:00")] is None


def test_asof_join_tolerance(quotes, trades):
    out = {
        (r.key, r.ts.isoformat()): r.asof_px
        for r in as_of_join(
            trades, quotes, ["key"], "ts", ["px"], tolerance="INTERVAL 10 MINUTES"
        ).collect()
    }
    # 12:00 trade is 60 min after the 11:00 quote -> outside tolerance.
    assert out[(1, "2024-01-01T12:00:00")] is None
    assert out[(1, "2024-01-01T10:05:00")] == 101.0


def test_asof_preserves_left_rowcount(spark):
    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = as_of_join(purchases, clicks, ["user_id"], "ts", ["value"])
    assert joined.count() == purchases.count()


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),
            (1, _ts("2024-01-01T10:10:00")),  # gap 10m -> same session
            (1, _ts("2024-01-01T11:00:00")),  # gap 50m -> new session
            (2, _ts("2024-01-01T10:00:00")),
        ],
        "user long, ts timestamp",
    )
    out = sessionize(df, ["user"], "ts", max_gap_seconds=1800).collect()
    sess = {(r.user, r.ts.isoformat()): r.session_seq for r in out}
    assert sess[(1, "2024-01-01T10:00:00")] == 1
    assert sess[(1, "2024-01-01T10:10:00")] == 1
    assert sess[(1, "2024-01-01T11:00:00")] == 2
    assert sess[(2, "2024-01-01T10:00:00")] == 1


def test_tumbling_agg_counts_sum_to_total(spark):
    ev = load_table(spark, SF, "events")
    out = tumbling_agg(ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")])
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    # window starts are hour-aligned
    misaligned = out.filter(
        (F.minute("window_start") != 0) | (F.second("window_start") != 0)
    ).count()
    assert misaligned == 0


def test_skyline_known_points(spark):
    from rocana_impala_udfs_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 1.0, 2.0), (4, 3.0, 0.5), (5, 1.0, 2.0)],
        "id long, cost double, gain double",
    )
    # minimize cost, maximize gain: (1.0, 2.0) dominates 1 and 2; row 4 has
    # worst cost but is not dominated on gain... (3,1.0,2.0) dominates
    # (4,3.0,0.5)? cost 1<3 and gain 2>0.5 -> yes dominated. Duplicates 3,5
    # both survive.
    got = sorted(r.id for r in skyline(df, [("cost", "min"), ("gain", "max")]).collect())
    assert got == [3, 5]


def test_skyline_distributive_invariance(spark):
    """Result must not depend on partitioning (the distributivity the
    two-phase plan relies on)."""
    from rocana_impala_udfs_spark.operators.skyline import skyline

    p = load_table(spark, SF, "part").select("p_partkey", "p_retailprice", "p_size")
    crit = [("p_retailprice", "min"), ("p_size", "max")]
    one = {r.p_partkey for r in skyline(p.coalesce(1), crit).collect()}
    many = {r.p_partkey for r in skyline(p.repartition(13), crit).collect()}
    assert one == many and len(one) > 0


def test_skyline_tree_level_is_conditional_on_fan_in(spark):
    """VERDICT r11 #3 (skyline_parts 1.36x drift): the mid tree-reduce
    level only pays when it reduces the final task's fan-in, so a
    low-partition input (the sf0.1 part scan is 1-2 partitions) must plan
    exactly TWO MapInPandas stages (the r1 shape), while a high-partition
    input keeps the three-level tree."""
    from rocana_impala_udfs_spark.operators.skyline import skyline

    p = load_table(spark, SF, "part").select("p_partkey", "p_retailprice", "p_size")
    crit = [("p_retailprice", "min"), ("p_size", "max")]

    def n_stages(df):
        return df._jdf.queryExecution().executedPlan().toString().count("MapInPandas")

    assert n_stages(skyline(p.coalesce(1), crit)) == 2

    # r12 review: building the skyline plan over a SHUFFLE-FED input must
    # not submit a job (the old `.rdd.getNumPartitions()` materialized the
    # upstream AQE map stages, executing the subplan twice per call).
    jsc_tracker = spark.sparkContext._jsc.sc().statusTracker()
    before = set(jsc_tracker.getJobIdsForGroup(None))
    built = skyline(p.repartition(32), crit)
    after = set(jsc_tracker.getJobIdsForGroup(None))
    assert after == before, "skyline plan construction submitted a Spark job"
    assert n_stages(built) == 3

    # ADVICE r12 #4: the fan-in estimate reads the TOPMOST Exchange, not
    # the max over all of them — an upstream wide shuffle followed by a
    # narrow repartition(2) feeds the local phase with 2 partitions, so
    # the mid tree level must NOT be planned.
    narrow = skyline(p.repartition(200, "p_partkey").repartition(2), crit)
    assert n_stages(narrow) == 2


def test_bucketed_range_join_boundaries(spark):
    from rocana_impala_udfs_spark.operators.temporal import bucketed_range_join

    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 149.9), (5, 250.0), (6, 999.0)],
        "pid long, value double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 250.0)], "band string, lo double, hi double"
    )
    out = {
        r.pid: r.band
        for r in bucketed_range_join(points, intervals, "value", bucket_size=50.0).collect()
    }
    # lo inclusive, hi exclusive; interval b spans 5 buckets; 250.0 and 999.0
    # fall outside every band.
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}


def test_salted_agg_two_stage_plan(spark):
    """The salted plan must aggregate (key, salt) before the final key agg —
    i.e. two HashAggregate pairs — and match the naive result."""
    from rocana_impala_udfs_spark.operators.skew import salted_agg

    ev = load_table(spark, SF, "events")
    out = salted_agg(ev, ["event_type"], "value", n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final × two stages
    naive = {
        r.event_type: (r.s, r.c)
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("value").alias("c"))
        .collect()
    }
    got = {r.event_type: (r.value_sum, r.value_count) for r in out.collect()}
    assert set(got) == set(naive)
    for k in naive:
        assert got[k][0] == pytest.approx(naive[k][0], rel=1e-12)
        assert got[k][1] == naive[k][1]


def test_multi_resolution_rollup_consistency(spark):
    """Each coarser level must re-aggregate exactly to the finer level's
    totals (the invariant that makes hierarchical rollup legal)."""
    from rocana_impala_udfs_spark.operators.temporal import multi_resolution_rollup

    ev = load_table(spark, SF, "events")
    out = multi_resolution_rollup(ev, "ts", ["event_type"], "value")
    totals = {
        r.granularity: (r.n, round(r.s, 6))
        for r in out.groupBy("granularity")
        .agg(F.sum("n").alias("n"), F.sum("value_sum").alias("s"))
        .collect()
    }
    assert totals["minute"][0] == totals["hour"][0] == totals["day"][0]
    assert totals["minute"][1] == pytest.approx(totals["hour"][1], rel=1e-9)
    assert totals["hour"][1] == pytest.approx(totals["day"][1], rel=1e-9)


def test_approx_count_distinct_error_bound(spark):
    li = load_table(spark, SF, "lineitem")
    approx = {
        r.l_returnflag: r.a
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.e
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("e")).collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.1


def test_percentile_approx_rank_error(spark):
    li = load_table(spark, SF, "lineitem")
    got = li.agg(F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m")).collect()[0].m
    exact = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m")).collect()[0].m
    assert abs(got - exact) / exact < 0.01


def test_sliding_windows_cover_each_event_four_times(spark):
    # 1 h window / 15 min slide => every event falls in exactly 4 windows.
    from rocana_impala_udfs_spark.plans.temporal import q_sliding_window_event_rates

    ev_count = load_table(spark, SF, "events").count()
    out = q_sliding_window_event_rates(spark, SF)
    total = out.agg(F.sum("n").alias("s")).collect()[0].s
    assert total == 4 * ev_count


def test_funnel_strictly_after_semantics(spark):
    """A user whose click precedes every view must not convert; conversion
    times chain off the FIRST qualifying event per step."""
    from datetime import datetime

    from rocana_impala_udfs_spark.operators.funnel import funnel_steps

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 converts fully: view@0 -> click@5 -> purchase@9
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # u2: click BEFORE first view -> no click conversion
        (2, t(3), "click"), (2, t(4), "view"),
        # u3: view only
        (3, t(1), "view"),
        # u4: purchase before click -> stops at click
        (4, t(0), "view"), (4, t(2), "purchase"), (4, t(6), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: r.n_users for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_ewma_smooth_hand_computed(spark):
    from rocana_impala_udfs_spark.operators.temporal import ewma_smooth

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "k long, seq long, x double",
    )
    got = {
        (r.k, r.seq): r.ewma
        for r in ewma_smooth(df, ["k"], ["seq"], "x", alpha=0.5).collect()
    }
    assert got[(1, 1)] == 10.0
    assert got[(1, 2)] == 0.5 * 20.0 + 0.5 * 10.0
    assert got[(1, 3)] == 0.5 * 30.0 + 0.5 * (0.5 * 20.0 + 0.5 * 10.0)
    assert got[(2, 1)] == 5.0  # independent key restarts the fold


def test_interpolate_fill_hand_computed(spark):
    from rocana_impala_udfs_spark.operators.temporal import interpolate_fill

    # buckets at 0s, 60s present; 120s missing; 180s present; values 10, 20, ?, 50
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 60, 20.0), ("a", 180, 50.0)],
        "g string, sec long, v double",
    ).select("g", F.timestamp_seconds("sec").alias("b"), "v")
    got = {
        r.b.second + r.b.minute * 60: (r.v, r.v_filled)
        for r in interpolate_fill(df, "b", ["g"], "v", 60).collect()
    }
    assert got[0] == (10.0, 10.0)
    assert got[60] == (20.0, 20.0)
    # 120s sits 1/2 of the way from 60s (20.0) to 180s (50.0) -> 35.0
    assert got[120] == (None, 35.0)
    assert got[180] == (50.0, 50.0)


def test_r4_operators_on_empty_input(spark):
    from rocana_impala_udfs_spark.operators.reservoir import appx_percentile_bounded_agg
    from rocana_impala_udfs_spark.operators.temporal import ewma_smooth, interpolate_fill

    empty_ev = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp, value double"
    )
    assert ewma_smooth(empty_ev, ["user_id"], ["ts", "event_id"], "value").count() == 0

    empty_agg = spark.createDataFrame([], "g string, b timestamp, v double")
    assert interpolate_fill(empty_agg, "b", ["g"], "v", 60).count() == 0

    # global percentile over an empty relation keeps the reference's
    # empty => one NULL row convention (median.cc:295-298)
    empty = spark.createDataFrame([], "x double")
    rows = appx_percentile_bounded_agg(empty, "x", 0.9, 100, out="v").collect()
    assert len(rows) == 1 and rows[0].v is None


def test_cusum_fold_hand_computed(spark):
    from rocana_impala_udfs_spark.operators.temporal import cusum_fold

    # target 10: x = 12, 8, 15 -> s = 2, 0, 5  (one-sided, clamped at 0)
    df = spark.createDataFrame(
        [("a", 1, 12.0, 10.0), ("a", 2, 8.0, 10.0), ("a", 3, 15.0, 10.0),
         ("b", 1, 9.0, 10.0)],
        "k string, seq long, x double, target double",
    )
    got = {
        (r.k, r.seq): r.cusum
        for r in cusum_fold(df, ["k"], ["seq"], "x", "target").collect()
    }
    assert got[("a", 1)] == 2.0
    assert got[("a", 2)] == 0.0   # 2 + (8-10) clamps to 0
    assert got[("a", 3)] == 5.0
    assert got[("b", 1)] == 0.0   # below target from the start


def test_time_weighted_avg_hand_computed(spark):
    from rocana_impala_udfs_spark.operators.temporal import time_weighted_avg

    # key a: value 10 for 10s, then linearly 10->30 over the next 10s:
    # area = (10+10)/2*10 + (10+30)/2*10 = 100 + 200 = 300; span 20s; twa 15
    df = spark.createDataFrame(
        [("a", 0, 1, 10.0), ("a", 10, 2, 10.0), ("a", 20, 3, 30.0),
         ("b", 0, 1, 7.0)],  # single-sample key: zero span, dropped
        "k string, sec long, id long, v double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "id", "v")
    rows = {r.k: r for r in time_weighted_avg(df, ["k"], "ts", "id", "v").collect()}
    assert set(rows) == {"a"}
    assert rows["a"].span_us == 20_000_000
    assert rows["a"].n_samples == 3
    assert rows["a"].twa == 15.0


def test_systematic_sample_every_kth(spark):
    from rocana_impala_udfs_spark.plans.temporal import q_sampling_systematic

    out = q_sampling_systematic(spark, "/root/testdata/sf0.001").collect()
    assert all((r.rn - 1) % 50 == 0 for r in out)
    # every type keeps its first-ranked event
    assert {r.event_type for r in out if r.rn == 1} == {
        "click", "error", "purchase", "signup", "view"
    }


def test_triangle_parts_counts_each_triangle_once(spark):
    from rocana_impala_udfs_spark.plans.relational import q_graph_triangle_parts

    out = q_graph_triangle_parts(spark, "/root/testdata/sf0.001").collect()
    # every triangle contributes exactly 3 corner rows, so the total
    # participation count is divisible by 3
    assert sum(r.n_triangles for r in out) % 3 == 0
    assert all(r.n_triangles >= 1 for r in out)


def test_theilsen_exact_on_linear_data(spark):
    from rocana_impala_udfs_spark.functions.median import exact_upper_median
    from pyspark.sql import functions as SF

    # perfectly linear daily counts -> every pairwise slope equals the true
    # slope, so the median of slopes is exact regardless of pairing
    daily = spark.createDataFrame(
        [("a", d * 86400000000, 100 + 7 * d) for d in range(10)],
        "event_type string, d_us long, n long",
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (SF.col("a.event_type") == SF.col("b.event_type"))
        & (SF.col("a.d_us") < SF.col("b.d_us")),
    ).select(
        SF.col("a.event_type").alias("event_type"),
        SF.try_divide(
            (SF.col("b.n") - SF.col("a.n")).cast("double"),
            (SF.col("b.d_us") - SF.col("a.d_us")).cast("double") / SF.lit(86400000000.0),
        ).alias("slope"),
    )
    rows = exact_upper_median(slopes, "slope", ["event_type"], out="m").collect()
    assert len(rows) == 1 and rows[0].m == 7.0


def test_psi_zero_when_distributions_match(spark):
    from rocana_impala_udfs_spark.plans.relational import q_quality_psi_price_drift

    out = q_quality_psi_price_drift(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 10  # ten decile buckets, all present
    # PSI terms are finite and tiny unless the split genuinely drifted
    total = sum(abs(r.psi_term) for r in out)
    assert total < 1.0


def test_k_anonymity_histogram_accounts_for_everyone(spark):
    from rocana_impala_udfs_spark.plans.relational import q_quality_k_anonymity

    out = q_quality_k_anonymity(spark, "/root/testdata/sf0.001").collect()
    n_customers = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert sum(r.n_customers for r in out) == n_customers
    assert all(r.below_k5 == (r.size < 5) for r in out)


def test_jaro_winkler_textbook_values():
    from rocana_impala_udfs_spark.operators.fuzzy import _jaro_winkler_py

    # Winkler's classic examples
    assert abs(_jaro_winkler_py("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12
    assert abs(_jaro_winkler_py("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9
    assert _jaro_winkler_py("same", "same") == 1.0
    assert _jaro_winkler_py("", "x") == 0.0
    assert _jaro_winkler_py("abc", "xyz") == 0.0


def test_best_fuzzy_match_deterministic_tiebreak(spark):
    from pyspark.sql import functions as SF
    from rocana_impala_udfs_spark.operators.fuzzy import best_fuzzy_match

    # ids 2 and 3 have the identical name: both score 1.0 against each
    # other, and id 1 ties between them -> tiebreak keeps the smaller id
    df = spark.createDataFrame(
        [(1, "red widget"), (2, "red widgets"), (3, "red widgets")],
        "id long, name string",
    )
    out = {
        r.id: (r.match_id, r.jw)
        for r in best_fuzzy_match(df, "id", "name", SF.substring("name", 1, 1)).collect()
    }
    assert out[2] == (3, 1.0)
    assert out[3] == (2, 1.0)
    assert out[1][0] == 2  # tie between 2 and 3 resolved to the smaller id


def test_cdc_apply_equals_full_recompute(spark):
    from rocana_impala_udfs_spark.operators.reconcile import cdc_apply, cdc_latest

    ops = spark.createDataFrame(
        [
            (1, "I", 10.0, 1), (1, "U", 11.0, 2),          # survives as U/11
            (2, "I", 20.0, 1), (2, "D", 0.0, 3),           # deleted
            (3, "I", 30.0, 4),                              # delta-only insert
            (2, "U", 21.0, 2),                              # out-of-order update < delete
        ],
        "k long, op string, v double, seq long",
    )
    base = cdc_latest(ops.filter(ops.seq <= 2), ["k"], ["seq"])
    delta = ops.filter(ops.seq > 2)
    incremental = {
        r.k: (r.op, r.v) for r in cdc_apply(base, delta, ["k"], ["seq"]).collect()
    }
    full = {
        r.k: (r.op, r.v)
        for r in cdc_latest(ops, ["k"], ["seq"]).filter("op <> 'D'").collect()
    }
    assert incremental == full == {1: ("U", 11.0), 3: ("I", 30.0)}


def test_holt_fold_hand_computed(spark):
    from rocana_impala_udfs_spark.operators.temporal import holt_fold

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 14.0), ("a", 3, 20.0)],
        "k string, seq long, x double",
    )
    got = {
        r.seq: (r.level, r.trend)
        for r in holt_fold(df, ["k"], ["seq"], "x", alpha=0.5, beta=0.3).collect()
    }
    assert got[1] == (10.0, 0.0)
    # level2 = .5*14 + .5*(10+0) = 12 ; trend2 = .3*(12-10) + .7*0 = .6
    assert got[2] == (12.0, 0.6)
    l3 = 0.5 * 20.0 + 0.5 * (12.0 + 0.6)
    t3 = 0.3 * (l3 - 12.0) + 0.7 * 0.6
    assert got[3] == (l3, t3)


def test_clustering_coeff_is_one_on_a_clique(spark):
    from pyspark.sql import functions as SF
    from rocana_impala_udfs_spark.plans.relational import q_graph_clustering_coeff

    out = q_graph_clustering_coeff(spark, "/root/testdata/sf0.001").collect()
    for r in out:
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.n_tri <= r.deg * (r.deg - 1) // 2  # triangles fit the degree


def test_basket_lift_identities(spark):
    from rocana_impala_udfs_spark.plans.relational import q_basket_rules_lift

    out = q_basket_rules_lift(spark, "/root/testdata/sf0.001").collect()
    for r in out:
        # lift = confidence / expected: lift == conf_1_to_2 / support(p2)
        # and both confidences bound in (0, 1]
        assert 0.0 < r.conf_1_to_2 <= 1.0
        assert 0.0 < r.conf_2_to_1 <= 1.0
        assert r.support > 0.0


def test_ks_statistic_detects_identical_and_disjoint(spark):
    from pyspark.sql import functions as SF, Window

    def ks(df):
        per_v = df.groupBy("v").agg(
            SF.sum("is_ref").alias("r"), SF.sum(1 - SF.col("is_ref")).alias("c")
        )
        tot = per_v.agg(SF.sum("r").alias("nr"), SF.sum("c").alias("nc"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        return (
            per_v.crossJoin(SF.broadcast(tot))
            .select(
                SF.abs(
                    SF.sum("r").over(w).cast("double") / SF.col("nr").cast("double")
                    - SF.sum("c").over(w).cast("double") / SF.col("nc").cast("double")
                ).alias("d")
            )
            .agg(SF.max("d"))
            .collect()[0][0]
        )

    same = spark.createDataFrame(
        [(float(i % 10), s) for i in range(40) for s in (0, 1)], "v double, is_ref int"
    )
    assert ks(same) == 0.0  # identical samples: D = 0
    disjoint = spark.createDataFrame(
        [(float(i), 1) for i in range(10)] + [(float(i + 100), 0) for i in range(10)],
        "v double, is_ref int",
    )
    assert ks(disjoint) == 1.0  # fully separated samples: D = 1


def test_longest_streak_hand_computed(spark):
    from rocana_impala_udfs_spark.plans.relational import q_events_longest_streak
    from pyspark.sql import functions as SF, Window

    # replicate the island logic on a hand-built day table
    days = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 14), (2, 5)], "user_id long, d long"
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("island", SF.col("d") - SF.row_number().over(w))
    got = {
        r.user_id: r.longest
        for r in islands.groupBy("user_id", "island")
        .count()
        .groupBy("user_id")
        .agg(SF.max("count").alias("longest"))
        .collect()
    }
    assert got == {1: 3, 2: 1}  # days 10-12 form the 3-day streak


def test_multitouch_credit_sums_to_one(spark):
    """Position-based attribution invariant: per purchase, credits sum to
    1.0 (within rounding), first/last get 0.4 when n>=3, and positions are
    1..n without gaps."""
    from rocana_impala_udfs_spark.plans.temporal import q_attribution_multitouch

    rows = q_attribution_multitouch(spark, SF).collect()
    assert rows
    by_p = {}
    for r in rows:
        by_p.setdefault(r.purchase_id, []).append(r)
    for pid, touches in by_p.items():
        n = touches[0].n_touches
        assert len(touches) == n
        assert sorted(t.pos for t in touches) == list(range(1, n + 1))
        assert abs(sum(t.credit for t in touches) - 1.0) < 1e-4, pid
        if n >= 3:
            first = next(t for t in touches if t.pos == 1)
            last = next(t for t in touches if t.pos == n)
            assert first.credit == 0.4 and last.credit == 0.4


def test_markov_eval_counts_consistent(spark):
    """Backtest invariants: n_correct <= n_eval per prev_type; predictions
    come from the train-half transition table."""
    from rocana_impala_udfs_spark.plans.temporal import q_markov_predict_eval

    rows = q_markov_predict_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert r.predicted is not None


def test_cuped_reduces_variance_when_correlated(spark):
    """CUPED on a planted correlated panel: adjustment must cut variance
    and keep the UNWEIGHTED overall mean (theta-linear adjustments are
    mean-preserving across all users combined)."""
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    users = 400
    x = rng.normal(100, 20, users)
    y = 0.8 * x + rng.normal(0, 5, users)  # strongly covariate-driven
    rows = [(int(i), float(x[i]), float(y[i])) for i in range(users)]
    df = spark.createDataFrame(rows, "user_id long, x double, y double").withColumn(
        "variant", (F.col("user_id") % 2 == 0).cast("string")
    )
    stats = df.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("theta"),
        F.avg("x").alias("x_bar"),
        F.var_samp("y").alias("var_y"),
    ).collect()[0]
    adj = df.withColumn(
        "y_adj", F.col("y") - F.lit(stats.theta) * (F.col("x") - F.lit(stats.x_bar))
    )
    out = adj.agg(
        F.var_samp("y_adj").alias("v"), F.avg("y").alias("m"), F.avg("y_adj").alias("ma")
    ).collect()[0]
    assert out.v < 0.2 * stats.var_y  # big variance cut on correlated data
    assert abs(out.m - out.ma) < 1e-9  # mean preserved overall


def test_chi2_zero_on_planted_independence(spark, tmp_path):
    """Perfect independence (every type × variant cell at its expected
    count) must give chi2 == 0.0 exactly, and df = (R-1)(C-1)."""
    from rocana_impala_udfs_spark.plans.temporal import q_ab_chi2_type_by_variant

    # find one user per variant with the production md5 gate
    probe = spark.createDataFrame(
        [(i,) for i in range(1, 50)], "user_id long"
    ).withColumn(
        "variant",
        F.when(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("bigint") % 2
            == 0,
            "A",
        ).otherwise("B"),
    )
    by_v = {r.variant: r.user_id for r in probe.collect()}
    assert set(by_v) == {"A", "B"}
    rows = []
    eid = 0
    for u in (by_v["A"], by_v["B"]):
        for et, cnt in (("view", 6), ("click", 3), ("purchase", 2)):
            for _ in range(cnt):
                eid += 1
                rows.append((eid, "2024-01-01 00:00:00", u, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/events.parquet")
    out = q_ab_chi2_type_by_variant(spark, d).collect()[0]
    assert out.n_total == 22 and out.df == 2
    assert out.chi2 == 0.0


def test_welch_ttest_matches_numpy_formula(spark):
    """ab_welch_ttest vs the textbook Welch formulas computed in numpy
    from the same per-user metric — t, df, and means must agree to
    float precision (the engine path is exact-integer until one final
    double chain)."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_welch_ttest

    out = q_ab_welch_ttest(spark, SF).collect()[0]
    per_user = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0)).cast("double").alias("y"))
        .withColumn(
            "variant",
            F.when(
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
                .cast("bigint") % 2
                == 0,
                "A",
            ).otherwise("B"),
        )
        .collect()
    )
    ya = np.array([round(r.y * 1e6) for r in per_user if r.variant == "A"]) / 1e6
    yb = np.array([round(r.y * 1e6) for r in per_user if r.variant == "B"]) / 1e6
    na, nb = len(ya), len(yb)
    va, vb = ya.var(ddof=1), yb.var(ddof=1)
    se2 = va / na + vb / nb
    t = (ya.mean() - yb.mean()) / np.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert out.n_a == na and out.n_b == nb
    assert out.mean_a == pytest.approx(ya.mean(), abs=1e-4)
    assert out.mean_b == pytest.approx(yb.mean(), abs=1e-4)
    assert out.t_stat == pytest.approx(t, rel=1e-9)
    assert out.df_welch == pytest.approx(df, rel=1e-9)


def test_anova_matches_numpy_formula(spark):
    """ab_anova_value_by_type vs the textbook one-way ANOVA computed in
    numpy from the same cent-quantized values — F, eta-squared, and the
    grand mean must agree to float precision (validates the FORMULA
    independently of the engine-parity oracle, which shares the fold)."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_anova_value_by_type

    out = q_ab_anova_value_by_type(spark, SF).collect()[0]
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "value"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    arrs = [np.array(v, dtype=np.float64) for v in groups.values()]
    allv = np.concatenate(arrs)
    k, n = len(arrs), len(allv)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out.k_groups == k and out.n_total == n
    assert out.grand_mean == pytest.approx(allv.mean() / 100.0, abs=1e-4)
    assert out.f_stat == pytest.approx(f, rel=1e-9)
    assert out.eta_sq == pytest.approx(ssb / (ssb + ssw), rel=1e-9)


def test_stream_static_join_matches_batch(spark):
    """stream_static_enrich_join == the batch left-join + agg (the
    stream-static join is stateless, so per-row equality must hold
    exactly), including the NULL-segment group from NULL user_ids."""
    from rocana_impala_udfs_spark.plans.temporal import q_stream_static_enrich_join

    streamed = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.sum_value)
        for r in q_stream_static_enrich_join(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.sum_value)
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_ratio_delta_ci_matches_numpy_formula(spark):
    """ab_ratio_delta_ci vs the textbook delta-method formula in numpy
    over the same per-user (x, y) frame: ratio, se, and CI must agree to
    float precision, and the CI must bracket the ratio."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_ratio_delta_ci

    rows = {r.variant: r for r in q_ab_ratio_delta_ci(spark, SF).collect()}
    per_user = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
        .withColumn(
            "variant",
            F.when(
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
                .cast("bigint") % 2
                == 0,
                "A",
            ).otherwise("B"),
        )
        .collect()
    )
    for v in ("A", "B"):
        x = np.array([round(r.x * 1e6) for r in per_user if r.variant == v]) / 1e6
        y = np.array([float(r.y) for r in per_user if r.variant == v])
        n = len(x)
        R = x.sum() / y.sum()
        cov = np.cov(x, y, ddof=1)
        var_r = (cov[0, 0] - 2 * R * cov[0, 1] + R * R * cov[1, 1]) / (
            n * y.mean() ** 2
        )
        got = rows[v]
        assert got.n_users == n
        assert got.ratio == pytest.approx(R, rel=1e-12)
        assert got.se == pytest.approx(np.sqrt(var_r), rel=1e-9)
        assert got.ci_lo < got.ratio < got.ci_hi
        assert got.ci_hi - got.ratio == pytest.approx(1.96 * got.se, rel=1e-12)


def test_mutual_info_matches_numpy_and_zero_on_independence(spark, tmp_path):
    """ab_mutual_info_type_variant: (1) MI/H/NMI match the numpy textbook
    computation on the production data; (2) on a planted perfectly
    independent grid MI == 0.0 exactly (every cell term ln(1) = 0)."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_mutual_info_type_variant

    out = q_ab_mutual_info_type_variant(spark, SF).collect()[0]
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_type",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
                .cast("bigint")
                % 2
            ).alias("g"),
        )
        .collect()
    )
    types = sorted({r.event_type for r in ev})
    grid = np.zeros((len(types), 2))
    for r in ev:
        grid[types.index(r.event_type), int(r.g)] += 1
    p = grid / grid.sum()
    pr, pc = p.sum(axis=1), p.sum(axis=0)
    mi = float(sum(p[i, j] * np.log(p[i, j] / (pr[i] * pc[j]))
                   for i in range(len(types)) for j in range(2) if p[i, j] > 0))
    ht = float(-(pr * np.log(pr)).sum())
    hv = float(-(pc * np.log(pc)).sum())
    assert out.n_total == int(grid.sum())
    assert out.mi_nats == pytest.approx(mi, abs=2e-6)
    assert out.h_type == pytest.approx(ht, abs=2e-6)
    assert out.h_variant == pytest.approx(hv, abs=2e-6)
    assert out.nmi == pytest.approx(mi / np.sqrt(ht * hv), abs=2e-6)

    # planted independence: reuse the chi2 fixture construction
    probe = spark.createDataFrame([(i,) for i in range(1, 50)], "user_id long").withColumn(
        "g",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint") % 2,
    )
    by_v = {int(r.g): r.user_id for r in probe.collect()}
    rows, eid = [], 0
    for u in (by_v[0], by_v[1]):
        for et, cnt in (("view", 6), ("click", 3)):
            for _ in range(cnt):
                eid += 1
                rows.append((eid, "2024-01-01 00:00:00", u, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/events.parquet")
    ind = q_ab_mutual_info_type_variant(spark, d).collect()[0]
    assert ind.mi_nats == 0.0 and ind.nmi == 0.0


def test_kaplan_meier_matches_lifelines_formula(spark):
    """events_kaplan_meier_conversion vs a pure-python product-limit
    recomputation (the lifelines KaplanMeierFitter formula) from the same
    per-user durations; curve is monotone nonincreasing in [0, 1]."""
    from rocana_impala_udfs_spark.plans.temporal import (
        q_events_kaplan_meier_conversion,
    )

    got = q_events_kaplan_meier_conversion(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    pu = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))))
        .cast("date").alias("dp"),
    ).collect()
    gd = ev.agg(F.date_trunc("day", F.max("ts")).cast("date").alias("g")).collect()[0].g
    durs = [((r.dp - r.d0).days, 1) if r.dp is not None else ((gd - r.d0).days, 0)
            for r in pu]
    n_at_risk = len(durs)
    s = 1.0
    expect = []
    for t in sorted({d for d, o in durs if o == 1}):
        d_t = sum(1 for d, o in durs if o == 1 and d == t)
        n_t = sum(1 for d, o in durs if d >= t)
        s = 0.0 if d_t >= n_t else s * (n_t - d_t) / n_t
        expect.append((t, n_t, d_t, s))
    assert len(got) == len(expect)
    prev = 1.0
    for row, (t, n_t, d_t, s) in zip(got, expect):
        assert (row.duration_day, row.n_risk, row.d_events) == (t, n_t, d_t)
        assert row.s_km == pytest.approx(s, abs=2e-6)
        assert 0.0 <= row.s_km <= prev + 1e-12
        prev = row.s_km


def test_logrank_matches_textbook_formula(spark):
    """ab_logrank_conversion vs a pure-python recomputation of the
    log-rank statistic from the same per-user (duration, observed, group)
    triples."""
    from rocana_impala_udfs_spark.plans.temporal import q_ab_logrank_conversion

    out = q_ab_logrank_conversion(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events")
    pu = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))))
        .cast("date").alias("dp"),
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("bigint") % 2
        ).alias("g"),
    ).collect()
    gd = ev.agg(F.date_trunc("day", F.max("ts")).cast("date").alias("m")).collect()[0].m
    trip = [
        ((r.dp - r.d0).days if r.dp else (gd - r.d0).days, 1 if r.dp else 0,
         "A" if r.g == 0 else "B")
        for r in pu
    ]
    o_a = sum(1 for d, o, g in trip if o and g == "A")
    o_b = sum(1 for d, o, g in trip if o and g == "B")
    sum_diff = sum_v = 0.0
    for t in sorted({d for d, o, _ in trip if o}):
        na = sum(1 for d, _, g in trip if d >= t and g == "A")
        nb = sum(1 for d, _, g in trip if d >= t and g == "B")
        da = sum(1 for d, o, g in trip if d == t and o and g == "A")
        db = sum(1 for d, o, g in trip if d == t and o and g == "B")
        n, dd = na + nb, da + db
        sum_diff += da - dd * na / n
        if n > 1:
            sum_v += dd * na * nb * (n - dd) / (n * n * (n - 1))
    assert (out.o_a, out.o_b) == (o_a, o_b)
    assert out.logrank_chi2 == pytest.approx(sum_diff**2 / sum_v, rel=1e-9)


def test_trigram_paths_match_bruteforce_and_take_ordered(spark):
    """events_top_trigram_paths: rows equal a pandas recomputation of
    session-bounded trigram counts (ties → lexicographic), and the plan
    ranks via TakeOrdered (k-bounded), not a global sort."""
    from rocana_impala_udfs_spark.plans.temporal import q_events_top_trigram_paths

    df = q_events_top_trigram_paths(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [(r.path_a, r.path_b, r.path_c, r.n) for r in df.collect()]
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    from collections import Counter

    c: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        rows = list(g.itertuples())
        for i in range(2, len(rows)):
            g1 = (rows[i].ts - rows[i - 1].ts).total_seconds()
            g2 = (rows[i - 1].ts - rows[i - 2].ts).total_seconds()
            if g1 <= 1800 and g2 <= 1800:
                c[(rows[i - 2].event_type, rows[i - 1].event_type, rows[i].event_type)] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(a, b, x, n) for (a, b, x), n in expect]


def test_sequential_peeks_matches_numpy_and_boundary_shape(spark):
    """ab_sequential_peeks: the final peek's z equals the full-sample
    Welch z (the last cumulative window is everything), the boundary
    decays as √(K/k) hitting 1.96 at the horizon, and crossed is exactly
    |z| > boundary per row."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_sequential_peeks

    rows = q_ab_sequential_peeks(spark, SF).collect()
    K = rows[-1].peek
    for r in rows:
        assert r.boundary == pytest.approx(1.959963984540054 * np.sqrt(K / r.peek), rel=1e-12)
        assert r.crossed == (abs(r.z) > r.boundary)
    last = rows[-1]
    assert last.boundary == pytest.approx(1.959963984540054, rel=1e-12)
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
                .cast("bigint") % 2
            ).alias("g"),
        )
        .collect()
    )
    ya = np.array([round(r.value * 1e6) for r in ev if r.g == 0]) / 1e6
    yb = np.array([round(r.value * 1e6) for r in ev if r.g == 1]) / 1e6
    se = np.sqrt(ya.var(ddof=1) / len(ya) + yb.var(ddof=1) / len(yb))
    assert last.n_a == len(ya) and last.n_b == len(yb)
    assert last.z == pytest.approx((ya.mean() - yb.mean()) / se, rel=1e-9)


def test_cuped_sequential_peeks_matches_numpy(spark):
    """ab_cuped_sequential_peeks: every peek's theta, z_raw, z_cuped and
    var_reduction match a direct numpy recomputation (per-user cumulative
    post sums against the pre-period covariate, theta re-fit per peek),
    the boundary decays as √(K/k), crossed is |z_cuped| > boundary, and
    CUPED cuts the pooled SE² whenever x correlates with y."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_cuped_sequential_peeks

    rows = q_ab_cuped_sequential_peeks(spark, SF).collect()
    assert rows
    K = rows[-1].peek
    for r in rows:
        assert r.boundary == pytest.approx(1.959963984540054 * np.sqrt(K / r.peek), rel=1e-12)
        assert r.crossed == (abs(r.z_cuped) > r.boundary)

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
            "value",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
                .cast("bigint") % 2
            ).alias("g"),
        )
        .collect()
    )
    mid = (min(r.ts_us for r in ev) + max(r.ts_us for r in ev)) // 2
    users = sorted({r.user_id for r in ev})
    gmap = {r.user_id: r.g for r in ev}
    x = {u: 0 for u in users}
    for r in ev:
        if r.ts_us <= mid:
            x[r.user_id] += round(r.value * 1e6)
    days = sorted({r.day_us for r in ev if r.ts_us > mid})
    assert len(rows) == len(days)
    y = {u: 0 for u in users}
    for peek_row, day in zip(rows, days):
        for r in ev:
            if r.ts_us > mid and r.day_us == day:
                y[r.user_id] += round(r.value * 1e6)
        xv = np.array([x[u] for u in users], dtype=float) / 1e6
        yv = np.array([y[u] for u in users], dtype=float) / 1e6
        gv = np.array([gmap[u] for u in users])
        theta = np.cov(xv, yv, ddof=1)[0, 1] / np.var(xv, ddof=1)
        y_adj = yv - theta * (xv - xv.mean())
        za, zb = gv == 0, gv == 1
        assert (peek_row.n_a, peek_row.n_b) == (int(za.sum()), int(zb.sum()))
        assert peek_row.theta == pytest.approx(theta, rel=1e-9)
        se2_raw = yv[za].var(ddof=1) / za.sum() + yv[zb].var(ddof=1) / zb.sum()
        se2_adj = y_adj[za].var(ddof=1) / za.sum() + y_adj[zb].var(ddof=1) / zb.sum()
        assert peek_row.z_raw == pytest.approx(
            (yv[za].mean() - yv[zb].mean()) / np.sqrt(se2_raw), rel=1e-9
        )
        assert peek_row.z_cuped == pytest.approx(
            (y_adj[za].mean() - y_adj[zb].mean()) / np.sqrt(se2_adj), rel=1e-9
        )
        assert peek_row.var_reduction == pytest.approx(1.0 - se2_adj / se2_raw, rel=1e-9)


def test_srm_check_matches_python_gate_recomputation(spark):
    """ab_srm_check: counts equal a pure-Python md5-gate recomputation
    over distinct users, z is exactly (n_a-n_b)/sqrt(N), and the flag is
    |z| against the frozen 1e-4 quantile."""
    import hashlib
    import math

    from rocana_impala_udfs_spark.plans.temporal import q_ab_srm_check

    row = q_ab_srm_check(spark, SF).collect()[0]
    users = {
        r.user_id
        for r in load_table(spark, SF, "events").select("user_id").distinct().collect()
    }
    n_a = sum(
        1 for u in users if int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16) % 2 == 0
    )
    n_b = len(users) - n_a
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.z == (n_a - n_b) / math.sqrt(n_a + n_b)
    assert row.ratio_a == n_a / (n_a + n_b)
    assert row.srm == (abs(row.z) > 3.89059188641312)


def test_power_mde_matches_numpy(spark):
    """ab_power_mde: SE equals the Welch SE from numpy and
    MDE = (z_{.025}+z_{.8})·SE with the frozen quantile sum."""
    import numpy as np

    from rocana_impala_udfs_spark.plans.temporal import q_ab_power_mde

    out = q_ab_power_mde(spark, SF).collect()[0]
    per_user = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0)).cast("double").alias("y"))
        .withColumn(
            "g",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("bigint") % 2,
        )
        .collect()
    )
    ya = np.array([round(r.y * 1e6) for r in per_user if r.g == 0]) / 1e6
    yb = np.array([round(r.y * 1e6) for r in per_user if r.g == 1]) / 1e6
    se = np.sqrt(ya.var(ddof=1) / len(ya) + yb.var(ddof=1) / len(yb))
    assert (out.n_a, out.n_b) == (len(ya), len(yb))
    assert out.se == pytest.approx(se, rel=1e-9)
    assert out.mde_abs == pytest.approx(2.8015852181129683 * se, rel=1e-9)
    pooled = (ya.sum() + yb.sum()) / (len(ya) + len(yb))
    assert out.mde_rel == pytest.approx(out.mde_abs / pooled, rel=1e-9)


def test_cramers_v_consistent_with_chi2(spark):
    """ab_cramers_v: χ² matches the chi-square key's statistic on the same
    grid, and V = sqrt(chi2/(N·min(r−1,c−1))) lies in [0, 1]."""
    import math

    from rocana_impala_udfs_spark.plans.temporal import (
        q_ab_chi2_type_by_variant,
        q_ab_cramers_v,
    )

    v = q_ab_cramers_v(spark, SF).collect()[0]
    chi = q_ab_chi2_type_by_variant(spark, SF).collect()[0]
    assert v.chi2 == chi.chi2
    assert v.n_total == chi.n_total
    expect = math.sqrt(v.chi2 / (v.n_total * min(v.n_rows_grid - 1, v.n_cols_grid - 1)))
    assert v.cramers_v == pytest.approx(expect, rel=1e-12)
    assert 0.0 <= v.cramers_v <= 1.0
