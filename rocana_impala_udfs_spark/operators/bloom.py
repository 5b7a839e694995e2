"""Bloom-filter pruned semi-join — map-side pre-filtering of a fact table
against a keyed build side, entirely in JVM expressions.

The scale story: a semi-join normally shuffles (or at least scans and
broadcast-probes) every fact row; with a Bloom filter built from the dim
keys, the fact side drops non-matching rows AT THE SCAN with a few hash
probes per row, and only candidates reach the exact join.  This is what
Spark's own runtime row-level filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) does for eligible shapes — implemented here as an
explicit, composable operator so the pruning applies to any plan (and so
the mechanism is visible/testable rather than optimizer-dependent).

Exactness contract: Bloom filters admit false positives but never false
negatives, so `bloom_prune(facts) ⊇ semi_join(facts)`; following the prune
with the exact (broadcast) semi-join makes the composed output EQUAL to the
plain semi-join — which is what the DuckDB oracle checks.  The filter
itself is deterministic: bit positions derive from the same md5 hash both
engines share (no seeded murmur), ``m`` bits packed into ``m/64`` longs
built by ``bit_or`` aggregates (map-side combinable, state = m bits — the
reference's bounded-aggregation-state contract again).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_pos_sql(key_sql: str, salt: int, m_bits: int) -> str:
    """Portable bit position: 60-bit md5-derived integer of (key, salt),
    mod the filter width."""
    return (
        f"cast(conv(substring(md5(concat(cast({key_sql} as string), '#', '{salt}')), 1, 15),"
        f" 16, 10) as bigint) % {m_bits}"
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 2048, k: int = 3) -> DataFrame:
    """Aggregate the build side's keys into a single-row Bloom filter:
    one BIGINT column per 64-bit word, set via ``bit_or`` of per-key
    masks.  Partial aggregation applies (bit_or is commutative), so the
    shuffle ships at most ``m_bits`` bits per partition."""
    assert m_bits % 64 == 0
    n_words = m_bits // 64
    salted = keys.select(F.col(key_col).alias("k")).select(
        "k", F.explode(F.array([F.lit(r) for r in range(k)])).alias("r")
    )
    pos = salted.select(
        F.expr(
            "CASE "
            + " ".join(f"WHEN r = {r} THEN {_bit_pos_sql('k', r, m_bits)}" for r in range(k))
            + " END"
        ).alias("p")
    )
    # shiftleft with a COLUMN bit count needs the SQL form (the Python API
    # only takes an int literal)
    masked = pos.select(
        F.expr("cast(p div 64 as int)").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("mask"),
    )
    aggs = [
        F.bit_or(F.when(F.col("w") == i, F.col("mask")).otherwise(F.lit(0).cast("long"))).alias(
            f"w{i}"
        )
        for i in range(n_words)
    ]
    return masked.agg(*aggs)


def bloom_probe_cond(key_sql: str, bloom_words_array: Column, m_bits: int = 2048, k: int = 3) -> Column:
    """Probe condition: all ``k`` bit positions of the key (a SQL
    expression string) are set in the filter (passed as an
    ``array<bigint>`` of words).  Arithmetic shift + mask reads single
    bits; no Python anywhere."""
    conds = []
    for r in range(k):
        p_sql = _bit_pos_sql(key_sql, r, m_bits)
        word = F.element_at(bloom_words_array, F.expr(f"cast(({p_sql}) div 64 as int)") + 1)
        # read the single bit with SQL shift (column bit counts need expr);
        # the bit-63 mask is a negative long, and `& mask != 0` reads the
        # sign bit correctly too
        conds.append(
            word.bitwiseAND(
                F.expr(f"shiftleft(cast(1 as bigint), cast(({p_sql}) % 64 as int))")
            )
            != 0
        )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_pruned_semi_join(
    facts: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: facts are filtered map-side
    by the broadcast filter words, then exactly verified against the
    (broadcast) dim keys — output equals ``facts SEMI JOIN dim_keys``."""
    bloom = bloom_build(dim_keys, dim_key, m_bits, k)
    arr = F.array(*[F.col(f"w{i}") for i in range(m_bits // 64)])
    pruned = (
        facts.crossJoin(F.broadcast(bloom))
        .filter(bloom_probe_cond(fact_key, arr, m_bits, k))
        .drop(*[f"w{i}" for i in range(m_bits // 64)])
    )
    return pruned.join(
        F.broadcast(dim_keys.select(F.col(dim_key).alias(fact_key)).distinct()),
        fact_key,
        "left_semi",
    )
