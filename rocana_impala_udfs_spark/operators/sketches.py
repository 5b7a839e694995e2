"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The reference's charter is bounded-state approximate aggregation under the
partial→serialize→merge→finalize lifecycle (``median.cc:117-304`` implements
it for the reservoir-median UDA). KMV is the same contract applied to
distinct counting: the sketch state is the ``k`` smallest *distinct* hash
values of the aggregated column, states merge by union-then-truncate, and
the finalizer estimates ``D ≈ (k-1) / h_(k)`` where ``h_(k)`` is the k-th
smallest hash normalized to (0, 1).  Unlike HyperLogLog (Spark's
``approx_count_distinct``), KMV built on a hash both engines share (md5) is
fully deterministic and therefore *oracle-checkable* — the DuckDB oracle
reproduces the estimate bit-for-bit, giving this sketch family a driver
hash-green row instead of the weaker bounded-error check.

Scale notes
-----------
The plan is two exact relational steps, no Python:

1. ``groupBy(group, hash).agg()`` — dedupe hashes.  Partial (map-side)
   aggregation bounds shuffle volume by the number of *distinct* values,
   not rows; this is the same shuffle an exact ``count(DISTINCT)`` pays.
2. a ``row_number`` window per group over the distinct hashes, keep
   ``rk <= k`` — one more shuffle, input already deduped.

At 100 TB the dedupe shuffle dominates exactly as it would for exact
distinct counting; the win over exact counting is realized when the sketch
is *persisted and merged* across partitions/days (``kmv_merge``), which is
the production pattern: per-partition sketches of ``k`` doubles instead of
re-scanning history.  ``tests/test_sketches.py`` pins the merge identity
(sketch(A ∪ B) == merge(sketch(A), sketch(B))) and the (k, error) bound.

Error: relative standard error ≈ 1/sqrt(k-2) (Beyer et al., "On Synopses
for Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 48 bits of md5 → uniform double in (0, 1]; identical expression exists in
# DuckDB (conv == from hex), so oracles reproduce estimates exactly.
_HASH_BITS = 48
_HASH_DENOM = float(1 << _HASH_BITS)


def kmv_hash(value: Column) -> Column:
    """Uniform (0, 1] hash of any column, engine-portable (md5-based).

    DuckDB equivalent::

        (from_hex-style) CAST(('0x' || substring(md5(CAST(v AS VARCHAR)), 1, 12)) AS ...)

    — see :data:`ORACLE_HASH_EXPR` for the exact SQL used by oracles.
    """
    h48 = F.conv(F.substring(F.md5(value.cast("string")), 1, 12), 16, 10).cast("bigint")
    # +1 keeps the hash strictly positive so (k-1)/h_(k) never divides by 0.
    return (h48 + F.lit(1)).cast("double") / F.lit(_HASH_DENOM)


#: DuckDB expression computing the same (0, 1] hash of column ``{v}``.
ORACLE_HASH_EXPR = (
    "((CAST(('0x' || substring(md5(CAST({v} AS VARCHAR)), 1, 12)) AS BIGINT) + 1)"
    " / 281474976710656.0)"
)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV sketch state: the ``k`` smallest distinct hashes.

    Returns ``group_cols + [h, rk]`` — the serialized state a production
    job would persist (k doubles per group) and later ``kmv_merge``.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 for a usable estimator, got {k}")
    distinct = (
        df.select(*group_cols, kmv_hash(F.col(value_col)).alias("h"))
        .filter(F.col("h").isNotNull())
        .groupBy(*group_cols, "h")
        .agg(F.lit(1))
        .select(*group_cols, "h")
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return distinct.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmv_merge(*sketches: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Union sketch states and re-truncate to the k smallest per group —
    the UDA merge phase (cf. ``ReservoirSampleMerge``, ``median.cc:228``)."""
    unioned = sketches[0].select(*group_cols, "h")
    for s in sketches[1:]:
        unioned = unioned.unionByName(s.select(*group_cols, "h"))
    dd = unioned.groupBy(*group_cols, "h").agg(F.lit(1)).select(*group_cols, "h")
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return dd.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmv_finalize(sketch: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Estimate per-group distinct counts from a sketch state.

    When a group holds fewer than ``k`` hashes the sketch is exact (it saw
    every distinct value) and the finalizer returns that exact count —
    KMV's standard small-cardinality fallback.
    """
    return (
        sketch.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk"))
        .select(
            *group_cols,
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    (F.lit(float(k - 1)) / F.col("hk"))
                ),
                4,
            ).alias("est_distinct"),
        )
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 256
) -> DataFrame:
    """End-to-end per-group approximate distinct count (sketch → finalize)."""
    return kmv_finalize(kmv_sketch(df, group_cols, value_col, k), group_cols, k)


def kmv_oracle_sql(
    table: str, group_cols: list[str], value_col: str, k: int = 256
) -> str:
    """DuckDB SQL reproducing :func:`kmv_distinct` exactly (same hash, same
    row_number truncation, same (k-1)/h_(k) arithmetic and rounding)."""
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
    SELECT DISTINCT {g}, {ORACLE_HASH_EXPR.format(v=value_col)} AS h
    FROM {table} WHERE {value_col} IS NOT NULL
),
ranked AS (
    SELECT {g}, h, row_number() OVER (PARTITION BY {g} ORDER BY h) AS rk
    FROM hashed
),
kept AS (SELECT {g}, h FROM ranked WHERE rk <= {k})
SELECT {g},
       round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE {float(k - 1)} / max(h) END, 4) AS est_distinct
FROM kept GROUP BY {g}
"""


# --- Count-Min sketch (point-frequency estimation) --------------------------
#
# The same bounded-state mergeable-aggregate contract as KMV, applied to
# frequency estimation: state is a depth × width grid of counters; update
# adds each item's count to one counter per row (salted hash), merge is
# element-wise addition (counters are plain sums, so Spark's partial+final
# aggregation IS the merge), and the point estimate is the minimum across
# rows — an upper bound on the true count that tightens with width.  Like
# KMV, the hash is a shared md5 derivation, so the estimate is deterministic
# and oracle-checkable in any engine (unlike seeded murmur sketches).


def cm_bucket_sql(value_sql: str, salt_sql: str, width: int) -> str:
    """Portable bucket index: first 15 hex chars of md5(value + '#' + salt)
    parsed as a 60-bit integer, mod ``width`` — identical in Spark
    (conv hex) and DuckDB (0x-prefix cast)."""
    return (
        f"cast(conv(substring(md5(concat({value_sql}, '#', cast({salt_sql} as string))), 1, 15),"
        f" 16, 10) as bigint) % {width}"
    )


def countmin_counters(
    df: DataFrame,
    value_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the counter grid from a pre-aggregated (value, count) relation.

    Input should be the *distinct-value* count table (one shuffle over the
    corpus), so the explode-by-depth fan-out is vocabulary-sized, never
    corpus-sized; the grid itself is at most depth × width rows regardless
    of input scale — the whole point of the sketch.
    """
    salts = F.array([F.lit(r) for r in range(depth)])
    salted = df.select(
        F.col(value_col).alias("v"), F.col(count_col).alias("c")
    ).select("v", "c", F.explode(salts).alias("r"))
    return (
        salted.select(
            "r", F.expr(cm_bucket_sql("v", "r", width)).alias("bucket"), "c"
        )
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("counter"))
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """Per-group HyperLogLog register state on an engine-portable hash.

    Spark's ``approx_count_distinct`` is HLL too, but its murmur hash and
    sparse/dense encodings are engine-private, so it can only ever earn a
    weak bounded-error check.  This sketch is the same public algorithm
    (Flajolet et al. 2007, with the small-range linear-counting correction)
    on the shared 60-bit md5 derivation, making the estimate deterministic
    and oracle-exact — the same portability move as :func:`kmv_sketch`, at
    HLL's O(m) state instead of KMV's O(k) but with register-max merge.

    State = one row per (group, register) with the max rho; ``max`` is the
    merge, so Spark's partial+final aggregation IS the UDA merge phase
    (cf. ``ReservoirSampleMerge``, ``median.cc:228`` — same lifecycle,
    different monoid).  Shuffle volume is bounded by groups × m rows no
    matter the input scale; zeroed registers are carried as a count, not
    rows.

    Integer discipline: rho ≤ 61-p (60-bit hash, p index bits leaves 60-p
    value bits), so ``2^((61-p)-rho)`` sums exactly in BIGINT (≤ 2^60) —
    the harmonic denominator is an integer in both engines, never an
    order-dependent float summation.
    """
    m = 1 << p
    rmax = 61 - p  # leading-zero run of the (60-p)-bit value word, + 1
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    w = F.shiftright(h, p)
    blen = F.length(F.bin(w))
    rho = F.when(w == 0, F.lit(rmax)).otherwise(F.lit(rmax) - blen)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, (h % m).alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Finalize HLL register states into per-group distinct estimates.

    Harmonic mean over all ``m`` registers (absent register rows are rho=0
    zeros, folded in as ``V * 2^51`` integer terms), bias-corrected by
    alpha_m, with the standard small-range fallback ``m * ln(m/V)`` when
    the raw estimate ≤ 2.5m and zeros remain.  Every float op is a single
    fixed-order expression shared with the oracle; round(4) guards the one
    libm call (ln)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    shift = 61 - p  # rho ∈ [1, shift]; term 2^(shift-rho) ∈ [1, 2^(shift-1)]
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft with a column bit count only exists in SQL form; the
        # Python helper pins numBits to a Python int.
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {shift} - rho)")).alias("int_sum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    zeros = F.lit(m) - F.col("n_regs")
    denom = (F.col("int_sum") + zeros * F.lit(1 << shift)).cast("double") / F.lit(
        float(1 << shift)
    )
    raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_distinct"))


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """End-to-end per-group HLL distinct estimate (registers → finalize)."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def hll_oracle_sql(table: str, group_cols: list[str], value_col: str, p: int = 10) -> str:
    """DuckDB SQL reproducing :func:`hll_distinct` exactly: same 60-bit md5
    hash, same integer register/rho derivation (`format('{{:b}}', w)` is
    DuckDB's spelling of Spark's `bin`), same integer harmonic sum and the
    identical fixed-order float finalization."""
    m = 1 << p
    shift = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
    SELECT {g},
           CAST(('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM {table} WHERE {value_col} IS NOT NULL
),
regs AS (
    SELECT {g}, h % {m} AS register,
           CASE WHEN h // {m} = 0 THEN {shift}
                ELSE {shift} - length(format('{{:b}}', h // {m})) END AS rho
    FROM hashed
),
state AS (
    SELECT {g}, register, max(rho) AS rho FROM regs GROUP BY {g}, register
),
agg AS (
    SELECT {g},
           sum(CAST(1 AS BIGINT) << ({shift} - rho)) AS int_sum,
           count(*) AS n_regs
    FROM state GROUP BY {g}
)
SELECT {g},
       round(CASE WHEN CAST({alpha * m * m!r} AS DOUBLE)
                       / ((int_sum + ({m} - n_regs) * CAST({1 << shift} AS BIGINT))
                          / CAST({float(1 << shift)!r} AS DOUBLE)) <= CAST({2.5 * m!r} AS DOUBLE)
                  AND {m} - n_regs > 0
             THEN CAST({float(m)!r} AS DOUBLE)
                  * ln(CAST({float(m)!r} AS DOUBLE) / CAST({m} - n_regs AS DOUBLE))
             ELSE CAST({alpha * m * m!r} AS DOUBLE)
                  / ((int_sum + ({m} - n_regs) * CAST({1 << shift} AS BIGINT))
                     / CAST({float(1 << shift)!r} AS DOUBLE))
             END, 4) AS hll_distinct
FROM agg
"""


def countmin_estimate(
    counters: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]``: min over the
    ``depth`` counters each probe hashes to.  The counter grid is tiny
    (≤ depth × width rows) and broadcasts; a probe whose bucket has no
    counter row reads 0."""
    salts = F.array([F.lit(r) for r in range(depth)])
    p = probes.select(F.col(value_col).alias("v")).distinct()
    salted = p.select("v", F.explode(salts).alias("r")).select(
        "v", "r", F.expr(cm_bucket_sql("v", "r", width)).alias("bucket")
    )
    joined = salted.join(F.broadcast(counters), ["r", "bucket"], "left").fillna(
        0, ["counter"]
    )
    return joined.groupBy("v").agg(F.min("counter").alias("cm_est")).select(
        F.col("v").alias(value_col), "cm_est"
    )


# --- Bitmap (bitset) distinct-set algebra -----------------------------------
#
# The exact counterpart of the sketches above: integer key sets packed into
# 64-bit words (word = id // 64, bit = id % 64) and combined with bitwise
# aggregates.  bit_or is the merge (same partial+final contract), AND +
# popcount computes intersections WITHOUT materializing either side — the
# roaring-bitmap trick OLAP engines use for audience/set analytics.  Unlike
# KMV/HLL this is exact, at O(universe/64) state per group.


def bitmap_words(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Per-group bitmap state: one row per (group, word) with the OR of
    member bits.  Shuffle volume is bounded by groups × universe/64 words
    regardless of row count; bit_or partials combine map-side."""
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.expr(f"div({id_col}, 64)").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % 64 AS INT))").alias("bits"),
        )
        .groupBy("g", "word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bitmap_cardinality(words: DataFrame) -> DataFrame:
    """Exact distinct count per group: popcount over the word bitmap."""
    return words.groupBy("g").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )


def bitmap_intersect_count(words_a: DataFrame, words_b: DataFrame) -> DataFrame:
    """Exact |A ∩ B| via word-aligned AND + popcount — one equi-join on
    the word index, never a join on the members themselves.

    Each input must hold ONE group's words: the join is on ``word`` alone,
    so a frame containing several groups would silently cross-multiply
    bitmaps across groups. Multi-group frames fail loudly instead — the
    per-word ``bit_or`` collapse below is a correctness error for them
    (use a (g, word)-keyed join for grouped intersection)."""

    def one_group(words: DataFrame, side: str) -> DataFrame:
        # count_distinct(g) folds into the same aggregation; asserting via
        # a runtime-checked column keeps this one distributed pass with no
        # driver collect.
        return words.groupBy("word").agg(
            F.first("bits").alias(f"b{side}"),
            F.count_distinct("g").alias(f"ng{side}"),
        )

    a = one_group(words_a, "a")
    b = one_group(words_b, "b")
    out = a.join(b, "word").agg(
        F.coalesce(F.sum(F.bit_count(F.expr("ba & bb"))), F.lit(0))
        .cast("bigint")
        .alias("n_both"),
        F.coalesce(F.max("nga"), F.lit(0)).alias("_nga"),
        F.coalesce(F.max("ngb"), F.lit(0)).alias("_ngb"),
    )
    return out.select(
        F.when(
            (F.col("_nga") > 1) | (F.col("_ngb") > 1),
            F.raise_error(
                F.format_string(
                    "bitmap_intersect_count expects single-group inputs, got "
                    "%d / %d distinct groups per word",
                    "_nga",
                    "_ngb",
                )
            ).cast("bigint"),
        )
        .otherwise(F.col("n_both"))
        .alias("n_both")
    )
