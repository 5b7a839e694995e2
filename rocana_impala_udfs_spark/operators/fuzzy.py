"""Fuzzy string matching (record linkage) — edit-distance pair join
without a cross join.

SymSpell-style deletion neighborhoods: two strings within Levenshtein
distance 1 always share a member of their {self + every single-character
deletion} variant sets (a substitution is one deletion on each side at the
same position; an insert/delete is one deletion on the longer side). So an
EQUALITY join on exploded variants generates a candidate set with recall 1,
and a JVM ``levenshtein`` verification makes the output exact — the same
candidates-then-verify shape as MinHash-LSH (``operators/dedup.py``).

Scale: variants per string = len+1, so the exploded frame is O(total
chars); the shuffle is an equality join on short variant strings, never
O(n²). Driver-corpus names are short; for long strings the variant key
should be a fixed-width hash of the variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col, max_len: int = 256):
    """Array of the string itself plus every single-character deletion
    (pure JVM: transform over a position sequence + two substrings)."""
    s = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.lit(max_len))),
    )
    return F.array_union(F.array(s), dels)


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
    joining the result back on the string. Only ``max_dist=1`` keeps the
    single-deletion neighborhood complete; larger distances would need the
    full ≤d-deletion closure."""
    if max_dist != 1:
        raise NotImplementedError("deletion neighborhood implemented for max_dist=1")
    names = df.select(F.col(col).alias("name")).distinct()
    v = names.select("name", F.explode(_deletion_variants("name")).alias("variant"))
    x, y = v.alias("x"), v.alias("y")
    cand = (
        x.join(y, (F.col("x.variant") == F.col("y.variant")) & (F.col("x.name") < F.col("y.name")))
        .select(F.col("x.name").alias("a"), F.col("y.name").alias("b"))
        .distinct()
    )
    return (
        cand.select("a", "b", F.levenshtein("a", "b").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )
