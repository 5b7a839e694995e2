"""KMV distinct sketch: lifecycle identities and error bounds.

Mirrors the reference's UDA test strategy (``median-test.cc:58-82``): pin
the algebraic properties of the partial→merge→finalize lifecycle rather
than RNG-dependent internals — KMV has no RNG at all, so every property
here is exact.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.operators.sketches import (
    kmv_distinct,
    kmv_finalize,
    kmv_merge,
    kmv_sketch,
)

K = 128


@pytest.fixture(scope="module")
def ids_df(spark):
    # 3 groups with known distinct cardinalities 40 / 1000 / 5000, plus
    # duplicate rows so dedupe genuinely does work.
    rows = (
        [("small", i % 40) for i in range(200)]
        + [("mid", i) for i in range(1000)]
        + [("big", i) for i in range(5000)]
    )
    return spark.createDataFrame(rows, "g string, v long")


def test_small_groups_exact(spark, ids_df):
    """Below k the sketch saw every distinct hash — estimate is exact."""
    out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(ids_df, ["g"], "v", k=K).collect()
    }
    assert out["small"] == 40.0


def test_error_bound(spark, ids_df):
    """Relative error within 4 standard errors (4/sqrt(k-2)) per group."""
    out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(ids_df, ["g"], "v", k=K).collect()
    }
    bound = 4.0 / math.sqrt(K - 2)
    assert abs(out["mid"] - 1000) / 1000 < bound
    assert abs(out["big"] - 5000) / 5000 < bound


def test_merge_identity(spark, ids_df):
    """sketch(A ∪ B) == finalize(merge(sketch(A), sketch(B))) — the
    serialize→merge lifecycle loses nothing (cf. ReservoirSampleMerge,
    median.cc:228-282, which guarantees the same for the reservoir)."""
    a = ids_df.filter(F.col("v") % 2 == 0)
    b = ids_df.filter(F.col("v") % 2 == 1)
    merged = kmv_finalize(
        kmv_merge(
            kmv_sketch(a, ["g"], "v", k=K),
            kmv_sketch(b, ["g"], "v", k=K),
            group_cols=["g"],
            k=K,
        ),
        ["g"],
        k=K,
    )
    direct = kmv_distinct(ids_df, ["g"], "v", k=K)
    got = {r["g"]: r["est_distinct"] for r in merged.collect()}
    want = {r["g"]: r["est_distinct"] for r in direct.collect()}
    assert got == want


def test_sketch_state_is_bounded(spark, ids_df):
    """State never exceeds k rows per group regardless of cardinality —
    the bounded-state contract the reference's UDA is built around."""
    sizes = (
        kmv_sketch(ids_df, ["g"], "v", k=K)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= K for r in sizes)


def test_k_validation(spark, ids_df):
    with pytest.raises(ValueError):
        kmv_sketch(ids_df, ["g"], "v", k=2)


def test_prefix_filter_matches_full_join(spark):
    """Prefix filtering is exact: identical pairs to the full shingle
    self-join (no false negatives from the prefix, none added by the
    size-ratio filter)."""
    from rocana_impala_udfs_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from rocana_impala_udfs_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r["i"], r["j"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    pf = {
        (r["i"], r["j"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert pf == full
    assert len(full) > 0  # the corpus plants near-dups; the test must see them


def test_countmin_estimate_upper_bounds_truth(spark):
    from pyspark.sql import functions as F
    from rocana_impala_udfs_spark.operators.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    counts = spark.createDataFrame(
        [(f"tok{i}", (i % 7) + 1) for i in range(500)], "v string, c long"
    )
    counters = countmin_counters(counts, "v", "c", depth=4, width=64)
    # the grid never exceeds depth x width rows, whatever the vocabulary
    assert counters.count() <= 4 * 64
    est = countmin_estimate(counters, counts, "v", depth=4, width=64)
    joined = counts.join(est, "v").select("v", "c", "cm_est").collect()
    assert len(joined) == 500
    # count-min never underestimates
    assert all(r.cm_est >= r.c for r in joined)
    # with 500 keys in 64 buckets, collisions force some overestimates,
    # but a wide-enough grid keeps the estimate bounded by the total mass
    total = sum((i % 7) + 1 for i in range(500))
    assert all(r.cm_est <= total for r in joined)


def test_countmin_counters_merge_by_addition(spark):
    from rocana_impala_udfs_spark.operators.sketches import countmin_counters

    a = spark.createDataFrame([("x", 3), ("y", 2)], "v string, c long")
    b = spark.createDataFrame([("x", 1), ("z", 5)], "v string, c long")
    both = a.union(b)
    merged = {
        (r.r, r.bucket): r.counter
        for r in countmin_counters(both, "v", "c", depth=2, width=16).collect()
    }
    ga = {
        (r.r, r.bucket): r.counter
        for r in countmin_counters(a, "v", "c", depth=2, width=16).collect()
    }
    gb = {
        (r.r, r.bucket): r.counter
        for r in countmin_counters(b, "v", "c", depth=2, width=16).collect()
    }
    summed = {k: ga.get(k, 0) + gb.get(k, 0) for k in set(ga) | set(gb)}
    assert merged == summed  # element-wise addition IS the sketch merge


def test_bloom_never_false_negative_and_actually_prunes(spark):
    from pyspark.sql import functions as F
    from rocana_impala_udfs_spark.operators.bloom import (
        bloom_build,
        bloom_probe_cond,
        bloom_pruned_semi_join,
    )

    dim = spark.createDataFrame([(i * 3,) for i in range(200)], "k long")
    facts = spark.createDataFrame([(i,) for i in range(3000)], "fk long")

    bloom = bloom_build(dim, "k", m_bits=2048, k=3)
    arr = F.array(*[F.col(f"w{i}") for i in range(2048 // 64)])
    pruned = facts.crossJoin(F.broadcast(bloom)).filter(
        bloom_probe_cond("fk", arr, m_bits=2048, k=3)
    )
    kept = {r.fk for r in pruned.select("fk").collect()}
    members = {i * 3 for i in range(200)}
    # no false negatives: every true member survives the probe
    assert members <= kept
    # real pruning: the probe rejects the vast majority of non-members
    assert len(kept) < 3000 * 0.25

    # the composed operator is EXACTLY the semi-join
    exact = {r.fk for r in bloom_pruned_semi_join(facts, dim, "fk", "k").collect()}
    assert exact == members & set(range(3000))


def test_hll_error_bound_and_small_exact(spark, ids_df):
    """Portable HLL: relative error within 4 standard errors (4·1.04/sqrt(m))
    for the big groups; the linear-counting small-range path keeps tiny
    cardinalities near-exact."""
    from rocana_impala_udfs_spark.operators.sketches import hll_distinct

    out = {
        r["g"]: r["hll_distinct"]
        for r in hll_distinct(ids_df, ["g"], "v", p=10).collect()
    }
    bound = 4.0 * 1.04 / math.sqrt(1024)
    assert abs(out["small"] - 40) / 40 < bound
    assert abs(out["mid"] - 1000) / 1000 < bound
    assert abs(out["big"] - 5000) / 5000 < bound


def test_hll_register_max_is_the_merge(spark, ids_df):
    """HLL's merge monoid: registers(A ∪ B) == element-wise max of
    registers(A), registers(B) — so partial+final aggregation IS the UDA
    merge phase, and split/merge finalizes to the single-pass estimate."""
    from rocana_impala_udfs_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    a = ids_df.filter(F.col("v") % 2 == 0)
    b = ids_df.filter(F.col("v") % 2 == 1)
    merged = (
        hll_registers(a, ["g"], "v", p=10)
        .unionByName(hll_registers(b, ["g"], "v", p=10))
        .groupBy("g", "register")
        .agg(F.max("rho").alias("rho"))
    )
    via_merge = {
        (r["g"],): r["hll_distinct"]
        for r in hll_estimate(merged, ["g"], p=10).collect()
    }
    direct = {
        (r["g"],): r["hll_distinct"]
        for r in hll_estimate(hll_registers(ids_df, ["g"], "v", p=10), ["g"], p=10).collect()
    }
    assert via_merge == direct


def test_hll_state_is_bounded(spark, ids_df):
    """State never exceeds m = 2^p rows per group regardless of input size
    — the reference's bounded-state contract (median.h:42-50)."""
    from rocana_impala_udfs_spark.operators.sketches import hll_registers

    sizes = (
        hll_registers(ids_df, ["g"], "v", p=6)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= 64 for r in sizes)


def test_bitmap_intersect_rejects_multigroup(spark):
    """A word frame holding >1 group must fail loudly — joining on word
    alone would silently cross-multiply bitmaps across groups."""
    import pytest
    from pyspark.sql import functions as F

    from rocana_impala_udfs_spark.operators.sketches import (
        bitmap_intersect_count,
        bitmap_words,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], ["g", "uid"]
    )
    words = bitmap_words(df, "g", "uid")
    one = words.filter(F.col("g") == "a")
    with pytest.raises(Exception, match="single-group"):
        bitmap_intersect_count(words, one).collect()
    # the valid shape still works and is exact
    other = words.filter(F.col("g") == "b")
    assert bitmap_intersect_count(one, other).collect()[0].n_both == 1  # {2}


def test_wav_downsample_guards(spark):
    """Non-divisible decimation factor fails with a descriptive error."""
    import pytest

    from rocana_impala_udfs_spark.operators.multimodal import wav_downsample_stats

    with pytest.raises(ValueError, match="factor"):
        wav_downsample_stats(None, factor=0)

    import numpy as np

    from rocana_impala_udfs_spark.operators.multimodal import encode_wav

    payload = encode_wav(np.arange(10, dtype=np.int16), 8001)  # 8001 % 4 != 0
    media = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    with pytest.raises(Exception, match="not divisible"):
        wav_downsample_stats(media, factor=4).collect()
