"""Python UDTFs — the table-function third of the reference's registration
surface (reference README.md:37-47 registers UDAs; scalar UDFs and UDTFs are
the sibling DDL forms the host engine offers). Spark 4's ``spark.udtf.register``
maps them to ``LATERAL`` table functions callable from SQL.

UDTFs run row-at-a-time in Python workers; they're the right tool for
fan-out transforms whose output cardinality varies per row. For fixed
hot-path fan-out (shingling the whole corpus) the engine uses the JVM-side
``explode(word_shingles(...))`` path in operators/dedup.py — this module is
the *registration surface*, proving parity, not the bulk path.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, shingle string")
class WordShingles:
    """LATERAL word-k-shingles with positions.

    Normalization matches ``functions.text.normalize_text`` exactly
    (lower, collapse whitespace, trim) so output agrees with the JVM path.
    """

    def eval(self, text: str, k: int):  # noqa: A002
        norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
        if not norm:
            return
        words = norm.split(" ")
        for i in range(max(len(words) - k + 1, 0)):
            yield i, " ".join(words[i : i + k])


@udtf(returnType="token string, n int")
class TopTokens:
    """LATERAL per-document top-n tokens by frequency (ties → lexicographic)."""

    def eval(self, text: str, n: int):
        from collections import Counter

        norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
        if not norm:
            return
        counts = Counter(norm.split(" "))
        for tok, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]:
            yield tok, c


def register(spark: SparkSession) -> None:
    spark.udtf.register("word_shingles", WordShingles)
    spark.udtf.register("top_tokens", TopTokens)
