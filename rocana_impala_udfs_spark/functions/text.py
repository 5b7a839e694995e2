"""Text-analysis functions for LLM training-data pipelines.

Part of the north-star extension surface (BASELINE.json): language ID,
quality scoring, token counting, and document fingerprinting over
``documents(text)``. Built on the same registration surface as
``appx_median_bounded`` (SURVEY §2.2 "UDF/UDAF surface").

Design rule: everything that CAN be a built-in column expression IS one
(JVM-side, codegen, pushdown-friendly); Python only where genuinely needed
(language ID's n-gram profiles, SimHash bit twiddling) and then always as
Arrow-vectorized pandas UDFs, never row-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# Pure column expressions (JVM path — preferred)
# ---------------------------------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse runs of whitespace to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = normalize_text(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: alpha runs + single digits + punctuation,
    counted with a regex (JVM ``regexp_count``)."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


_STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by",
]


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    words = F.split(normalize_text(col), " ")
    sw = F.array(*[F.lit(w) for w in (stopwords or _STOPWORDS_EN)])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    total = F.size(words)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits.cast("double") / total.cast("double"))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] document quality: rewards moderate length and
    stopword presence, penalizes punctuation soup. Deterministic composition
    of JVM expressions (oracle-replicable in ANSI SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    return F.round((len_score + sw_score + punct_pen) / 3.0, 6)


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of normalized text.
    Identical normalization + md5 exist in DuckDB, so exact-dup detection is
    oracle-checkable end to end."""
    return F.md5(normalize_text(col))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of character n-grams of the normalized text (JVM-side via
    sequence+substring — no Python)."""
    t = normalize_text(col)
    count = F.length(t) - (n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), count), lambda i: t.substr(i, F.lit(n)))
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) of normalized text."""
    words = F.split(normalize_text(col), " ")
    count = F.greatest(F.size(words) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def _run_lengths(s: Column) -> Column:
    """Run lengths of a SORTED token array, via primitive-int HOFs only
    (filter/zip_with over index sequences — no per-element struct
    allocation, which makes the interpreted lambda path ~10x faster than an
    ``aggregate`` fold with a struct accumulator). ``size(result)`` is the
    distinct count; ``array_max`` the top frequency; runs equal to 1 are
    the singleton tokens."""
    n = F.size(s)
    seq = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1)
    )
    # 0-based positions where a new run starts (element differs from its
    # predecessor); element_at is 1-based.
    starts = F.filter(seq, lambda i: (i == 0) | (F.element_at(s, i + 1) != F.element_at(s, i)))
    shifted = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))), F.array(n)
    )
    return F.zip_with(starts, shifted, lambda a, b: b - a)


def repetition_profile(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (Gopher-rules style quality gates):
    ``top_word_frac`` (most frequent word / total words), ``dup_word_frac``
    (fraction of word occurrences beyond the first of each distinct word),
    ``dup_bigram_frac`` (fraction of bigram occurrences in bigrams seen
    more than once in the doc).

    Shuffle-free by construction: every signal is a per-row expression over
    the sorted word / bigram arrays (``_run_lengths``), so the operator is
    embarrassingly parallel map-side work at any scale — vs the obvious
    explode + groupBy(doc, token) alternative, which shuffles every token
    occurrence. (The one repartition below only widens small test inputs;
    a 100 TB scan already has wide parallelism and skips it.)
    Returns ``(id_col, top_word_frac, dup_word_frac, dup_bigram_frac)``.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        df = df.repartition(target)
    words = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.array_sort(words).alias("ws"),
        F.array_sort(word_shingles(text_col, 2)).alias("bs"),
    )
    wruns = _run_lengths(F.col("ws"))
    bruns = _run_lengths(F.col("bs"))
    nw = F.size("ws").cast("double")
    nb = F.greatest(F.size("bs"), F.lit(1)).cast("double")
    return base.select(
        id_col,
        F.round(F.coalesce(F.array_max(wruns), F.lit(0)) / nw, 6).alias("top_word_frac"),
        F.round(F.lit(1.0) - F.size(wruns) / nw, 6).alias("dup_word_frac"),
        F.round(
            (F.size("bs") - F.size(F.filter(bruns, lambda r: r == F.lit(1)))) / nb, 6
        ).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Pandas UDFs (Python path — only where expressions can't express it)
# ---------------------------------------------------------------------------

# Tiny per-language stopword/character profiles for the n-gram heuristic.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "for", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "es": {"el", "la", "los", "las", "que", "de", "y", "es", "en", "un", "una", "por"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "pour", "que"},
    "it": {"il", "la", "che", "di", "e", "un", "una", "per", "con", "sono"},
    "pt": {"o", "a", "os", "as", "que", "de", "e", "um", "uma", "para", "não"},
}


def _detect_lang(text: str) -> str:
    if not text:
        return "und"
    # CJK detection by codepoint ratio.
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > max(4, 0.05 * min(len(text), 400)):
        return "zh"
    words = text.lower().split()
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        hits = sum(1 for w in words if w in prof)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def make_lang_id_udf():
    """N-gram/stopword-heuristic language ID (und = undetermined)."""

    @pandas_udf("string")
    def lang_id(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(_detect_lang)

    return lang_id


def _simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = np.uint64(zlib_crc64(tok))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))


def zlib_crc64(s: str) -> int:
    """64-bit stable hash from two crc32 passes (no external deps)."""
    import zlib

    b = s.encode("utf-8")
    lo = zlib.crc32(b)
    hi = zlib.crc32(b, 0x9E3779B9)
    return (hi << 32) | lo


def make_simhash64_udf():
    """64-bit SimHash over whitespace tokens of normalized text — near-dup
    fingerprint; hamming distance ≤ 3 ⇒ near-duplicate candidates."""

    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        def one(t):
            t = (t or "").lower()
            return _simhash64(t.split())

        return texts.map(one)

    return simhash64


def make_rolling_hash_udf():
    """Polynomial rolling hash of normalized text (base 257, mod 2^61-1) —
    a cheap order-sensitive document fingerprint."""

    @pandas_udf("long")
    def rolling_hash_fingerprint(texts: pd.Series) -> pd.Series:
        MOD = (1 << 61) - 1
        BASE = 257

        def one(t):
            h = 0
            for ch in " ".join((t or "").lower().split()):
                h = (h * BASE + ord(ch)) % MOD
            return h

        return texts.map(one)

    return rolling_hash_fingerprint


def register(spark: SparkSession) -> None:
    """Register the SQL-callable text functions."""
    spark.udf.register("lang_id", make_lang_id_udf())
    spark.udf.register("simhash64", make_simhash64_udf())
    spark.udf.register("rolling_hash_fingerprint", make_rolling_hash_udf())
