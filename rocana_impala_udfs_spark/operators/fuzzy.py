"""Fuzzy string matching (record linkage) — edit-distance pair join
without a cross join.

SymSpell-style deletion neighborhoods (the public symspell algorithm,
Garbe): two strings within Levenshtein distance ``d`` always share a
member of their depth-``d`` deletion closures — every edit (substitution,
insert, delete) can be expressed as at most one deletion on each side, so
``lev(a, b) <= d`` implies ``D_<=d(a) ∩ D_<=d(b) != ∅``. An EQUALITY join
on exploded closure variants therefore generates a candidate set with
recall 1, and a JVM ``levenshtein`` verification makes the output exact —
the same candidates-then-verify shape as MinHash-LSH
(``operators/dedup.py``).

Scale: the depth-d closure of a length-L string has O(L^d) members
(L+1 at d=1, ~L²/2 more at d=2), so the exploded frame is O(total chars)
at d=1 and O(total chars × L) at d=2 — still linear in corpus size, never
O(n²) in the number of strings. The join keys are short variant strings;
a length band in the join condition (|len(a) − len(b)| <= d) prunes
candidates that verification would reject anyway before they shuffle.
For very long strings the variant key should be a fixed-width hash of the
variant; names in the driver corpus are short enough that raw variants
keep the plan debuggable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _single_deletions(s: Column, max_len: int = 256) -> Column:
    """Array of every single-character deletion of ``s`` (pure JVM:
    transform over a position sequence + two substrings). Empty array for
    the empty string — guarded because ``sequence(1, 0)`` would DESCEND,
    not produce an empty sequence."""
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.lit(max_len))),
    )
    return F.when(F.length(s) == 0, F.array().cast("array<string>")).otherwise(dels)


def _deletion_closure(col, max_dist: int, max_len: int = 256) -> Column:
    """The string itself plus every variant reachable by up to ``max_dist``
    character deletions, distinct, as one JVM array expression (no UDF)."""
    s = F.col(col) if isinstance(col, str) else col
    closure = F.array(s)
    frontier = F.array(s)
    for _ in range(max_dist):
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, lambda v: _single_deletions(v, max_len)))
        )
        closure = F.array_union(closure, frontier)
    return closure


def fuzzy_pairs(
    df: DataFrame,
    col: str = "p_name",
    max_dist: int = 1,
) -> DataFrame:
    """Exactly the DISTINCT-string pairs (a, b, dist) of ``col`` with
    ``levenshtein <= max_dist``, ``a < b`` (bytewise).

    Matching runs over the distinct value domain, not rows: real columns
    repeat values heavily, and row-level pairing would square every
    duplicate group (measured: 20k rows over 64 distinct names → tens of
    millions of row pairs vs ~10² name pairs). Callers re-attach ids by
    joining the result back on the string.

    ``max_dist`` 1 and 2 are supported (depth-d deletion closure); the
    closure blows up combinatorially beyond that and a different candidate
    scheme (q-gram filtering) would be the right plan.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion neighborhood implemented for max_dist in (1, 2)"
        )
    names = df.select(F.col(col).alias("name")).distinct()
    v = names.select(
        "name",
        F.length("name").alias("len"),
        F.explode(_deletion_closure("name", max_dist)).alias("variant"),
    )
    x, y = v.alias("x"), v.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.variant") == F.col("y.variant"))
            & (F.col("x.name") < F.col("y.name"))
            # length band: a pair differing by more than max_dist in length
            # can't verify; dropping it pre-shuffle-free at the join site
            # keeps hot short variants from fanning out.
            & (F.abs(F.col("x.len") - F.col("y.len")) <= max_dist),
        )
        .select(F.col("x.name").alias("a"), F.col("y.name").alias("b"))
        .distinct()
    )
    return (
        cand.select("a", "b", F.levenshtein("a", "b").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


def _jaro_winkler_py(s1: str, s2: str, p: float = 0.1, bt: float = 0.7) -> float:
    """Classic Jaro-Winkler (Winkler 1990): Jaro similarity from the
    matching-window match/transposition counts, boosted by up to 4 shared
    prefix chars when the base similarity exceeds 0.7.  This is the exact
    variant DuckDB's ``jaro_winkler_similarity`` implements — verified
    bit-for-bit on 20k real name pairs — which is what makes the linkage
    operator oracle-checkable."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if j > bt:
        prefix = 0
        for a, b in zip(s1, s2):
            if a == b and prefix < 4:
                prefix += 1
            else:
                break
        j += prefix * p * (1 - j)
    return j


def jaro_winkler_udf():
    """Arrow-batched pandas UDF for Jaro-Winkler similarity.  The kernel is
    an irreducibly character-level algorithm (matching window + transposition
    scan) with no JVM builtin, so it follows the same pattern as the codec
    kernels: per-row Python inside an Arrow batch, embarrassingly parallel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x or "", y or "") for x, y in zip(a, b)],
            dtype="float64",
        )

    return _jw


def best_fuzzy_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    min_sim: float = 0.9,
) -> DataFrame:
    """Record linkage by best Jaro-Winkler match within blocking groups:
    each record is scored against every OTHER record sharing its blocking
    key, and keeps its single best candidate (max similarity, smallest
    partner id on ties — fully deterministic).

    Scale design: the pair expansion is bounded by the largest block
    squared — the blocking key IS the scale knob (first-char here; add
    length bands / phonetic keys to tighten).  The join is a keyed
    equi-join on the block, never a cartesian; scoring runs in one
    Arrow-batched pass, and the argmax is a per-id window over the
    already-filtered candidates."""
    jw = jaro_winkler_udf()
    side = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name"), block_expr.alias("blk")
    )
    # Score DISTINCT VALUES, not records.  Naive record-pair scoring is
    # O(records² / blocks) Python-kernel calls; real catalogs repeat names
    # heavily, so the kernel only ever needs each distinct (name, name')
    # pair once — the measured difference on the 20k-part table (64 distinct
    # names) is 207 s → sub-second.  The record-level answer reassembles
    # exactly:
    #   - identical-name records match each other at jw = 1.0 (JW is 1.0
    #     iff the strings are equal), partner = the smallest other id;
    #   - otherwise a record inherits its name's best-scoring OTHER name,
    #     partner = that name's smallest id, ties broken by (jw DESC,
    #     partner id ASC) — the same contract the naive plan had.
    g1 = side.groupBy("blk", "name").agg(
        F.min("id").alias("min_id"), F.count(F.lit(1)).alias("cnt")
    )
    second = (
        side.join(g1.select("blk", "name", "min_id"), ["blk", "name"])
        .filter(F.col("id") > F.col("min_id"))
        .groupBy("blk", "name")
        .agg(F.min("id").alias("second_min"))
    )
    stats = g1.join(second, ["blk", "name"], "left")
    names = stats.select("blk", "name", "min_id")
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.blk").alias("blk"),
            F.col("a.name").alias("n1"),
            F.col("a.min_id").alias("m1"),
            F.col("b.name").alias("n2"),
            F.col("b.min_id").alias("m2"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select("blk", "n1", "m1", "n2", "m2", jw(F.col("n1"), F.col("n2")).alias("jw"))
        .filter(F.col("jw") >= F.lit(min_sim))
    )
    sym = pairs.select(
        "blk", F.col("n1").alias("name"), F.col("m2").alias("other_min"), "jw"
    ).unionByName(
        pairs.select("blk", F.col("n2").alias("name"), F.col("m1").alias("other_min"), "jw")
    )
    # max-of-struct: best jw first, then the SMALLEST partner id (ids are
    # non-negative, so max of the negated id is the min id)
    best_other = sym.groupBy("blk", "name").agg(
        F.max(F.struct(F.col("jw").alias("jw"), (-F.col("other_min")).alias("neg"))).alias("best")
    )
    out = (
        side.join(stats, ["blk", "name"])
        .join(best_other, ["blk", "name"], "left")
    )
    same_partner = F.when(
        F.col("cnt") >= 2,
        F.when(F.col("id") == F.col("min_id"), F.col("second_min")).otherwise(
            F.col("min_id")
        ),
    )
    # an identical-name partner scores 1.0, which strictly beats any
    # distinct-name candidate (jw < 1.0 for unequal strings)
    return (
        out.select(
            F.col("id").alias(id_col),
            F.coalesce(same_partner, (-F.col("best.neg")).cast("long")).alias("match_id"),
            F.when(same_partner.isNotNull(), F.lit(1.0))
            .otherwise(F.col("best.jw"))
            .alias("jw"),
        )
        .filter(F.col("match_id").isNotNull())
    )
