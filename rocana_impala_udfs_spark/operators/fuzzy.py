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

from pyspark.sql import Column, DataFrame
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
