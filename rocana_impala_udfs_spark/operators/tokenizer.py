"""Byte-pair-encoding tokenizer: distributed train + apply.

The real upgrade of the `bpe_ish_token_count` estimate (functions/text.py):
an actual BPE (Sennrich et al. 2016, the public subword-nmt algorithm)
trained on the corpus and applied per document.

Distributed shape (the k-means/MLlib contract): the corpus-heavy part —
word counting — is one distributed shuffle; merge training then runs on
the BOUNDED top-``vocab_words`` word-count table on the driver (O(merges ×
vocab) — ~5k rows regardless of corpus size, same as "only k×dim centroids
reach the driver"); the learned merge list (a few hundred string pairs)
broadcasts back and the encode pass is an embarrassingly parallel
Arrow-batched kernel with ZERO shuffle.

Determinism: word ties break lexicographically in the top-k, pair ties
break by (count desc, pair lexicographic) in training, so the same corpus
always yields the same merge table on any partitioning.

Not SQL-expressible (iterative merge recursion), so the query key is
weak-by-design: correctness is pinned in pytest against the classic
hand-computable example and invariants (lossless round-trip, monotone
token-count reduction, partitioning invariance).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.functions.text import normalize_text

END = "</w>"  # end-of-word sentinel, per the published algorithm


def word_counts(docs: DataFrame, text_col: str = "text", top_n: int = 5000) -> DataFrame:
    """Distributed word-count table, deterministic top-``top_n`` by
    (count desc, word asc) — the only corpus-scale pass in training."""
    return (
        docs.select(F.explode(F.split(normalize_text(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(top_n)
    )


def train_merges(vocab: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over a (word, count) vocabulary: repeatedly
    merge the most frequent adjacent symbol pair (ties: lexicographic).
    Pure driver-side function over the bounded vocab table."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in vocab:
        words[tuple(w) + (END,)] = words.get(tuple(w) + (END,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        words = nxt
    return merges


def bpe_train(
    docs: DataFrame, text_col: str = "text", num_merges: int = 200, top_n: int = 5000
) -> list[tuple[str, str]]:
    """Distributed word count → bounded driver-side merge training."""
    vocab = [(r.word, r.n) for r in word_counts(docs, text_col, top_n).collect()]
    return train_merges(vocab, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank pair first — the
    published greedy encode."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE statistics: token count, distinct subwords, compression
    vs whitespace words and vs characters. Broadcast merge table + zero-
    shuffle Arrow kernel."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                doc_id, text = int(r[0]), (r[1] or "")
                words = [w for w in text.lower().split() if w]
                toks: list[str] = []
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w, ranks)
                    toks.extend(cache[w])
                rows.append(
                    (
                        doc_id,
                        len(toks),
                        len(set(toks)),
                        len(words),
                        float(sum(len(w) for w in words) / len(toks)) if toks else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "bpe_tokens", "distinct_subwords", "n_words", "chars_per_token"],
            )

    out = docs.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            "doc_id bigint, bpe_tokens int, distinct_subwords int, "
            "n_words int, chars_per_token double"
        ),
    )
    return out.select(
        "doc_id",
        "bpe_tokens",
        "distinct_subwords",
        "n_words",
        F.round("chars_per_token", 4).alias("chars_per_token"),
    )
