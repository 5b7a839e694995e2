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
