"""Sequence packing — assemble documents into fixed-token-budget training
sequences (the step between a cleaned corpus and a trainer's data loader).

Greedy first-fit packing is inherently order-dependent, so a global optimum
would serialize the corpus; the scale-correct shape is PARTITION-LOCAL
packing: each partition greedily packs its own documents (mapInPandas, zero
shuffle), and bin ids are made globally unique by offsetting with the
partition index. Fill efficiency is within one underfull bin per partition
of the sequential result — at thousands of partitions that waste is
negligible, and the operator stays embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.functions.text import token_count

_PART_STRIDE = 1 << 40  # bins per partition namespace


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a packed sequence bin of capacity
    ``max_tokens`` (documents longer than the budget get a bin of their
    own). Returns ``(id_col, n_tokens, bin_id, bin_fill)`` where
    ``bin_fill`` is the bin's total tokens after packing.

    First-fit-decreasing per partition: sort the partition's docs by token
    count descending, place each into the first bin with room.
    """
    with_counts = docs.select(
        F.col(id_col), token_count(text_col).cast("int").alias("n_tokens")
    ).withColumn("_pid", F.spark_partition_id())

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True)
        if rows.empty:
            return
        pid = int(rows["_pid"].iloc[0])
        order = rows.sort_values("n_tokens", ascending=False, kind="mergesort")
        bins: list[int] = []  # remaining capacity per bin
        assign, fills = [], []
        for n in order["n_tokens"]:
            n = int(n)
            for b, room in enumerate(bins):
                if n <= room:
                    bins[b] = room - n
                    assign.append(b)
                    break
            else:
                bins.append(max(max_tokens - n, 0))
                assign.append(len(bins) - 1)
        base = pid * _PART_STRIDE
        out = order.assign(bin_id=[base + b for b in assign])
        fill_by_bin = out.groupby("bin_id")["n_tokens"].sum()
        out["bin_fill"] = out["bin_id"].map(fill_by_bin)
        yield out[[c for c in out.columns if c != "_pid"]]

    schema = f"{id_col} long, n_tokens int, bin_id long, bin_fill long"
    return with_counts.mapInPandas(pack, schema=schema)


def next_fit_pack_stats(
    docs: DataFrame,
    group_col: str = "source",
    capacity: int = 512,
) -> DataFrame:
    """DETERMINISTIC sequence packing — NEXT-FIT in doc_id order per
    group: walk documents in id order keeping one open bin; when the next
    doc's tokens don't fit, close the bin and open a new one.  Unlike the
    partition-order-dependent first-fit-decreasing of
    :func:`pack_sequences` (throughput-optimal, weak-checkable), next-fit
    is a pure left fold over a deterministic order — O(1) state, exactly
    reproducible, and therefore ORACLE-CHECKABLE via the same
    list_reduce replay as the EWMA/Holt/CUSUM folds.  The classic
    next-fit guarantee (≤ 2× optimal bins) is the price of determinism.

    One group-keyed ``applyInPandas`` fold; all arithmetic integer.
    Returns per group: docs, total tokens, bins used, fill of the last
    open bin.
    """
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.col("doc_id"),
        token_count("text").cast("bigint").alias("t"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, fill = 0, 0
        for t in pdf["t"].tolist():
            t = int(t)
            if bins == 0 or fill + t > capacity:
                bins += 1
                fill = t
            else:
                fill += t
        return pd.DataFrame(
            [
                {
                    "g": pdf["g"].iloc[0],
                    "n_docs": len(pdf),
                    "total_tokens": int(pdf["t"].sum()),
                    "n_bins": bins,
                    "last_fill": fill,
                }
            ]
        )

    return (
        toks.groupBy("g")
        .applyInPandas(
            fold,
            schema="g string, n_docs bigint, total_tokens bigint, n_bins bigint, last_fill bigint",
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "total_tokens",
            "n_bins",
            "last_fill",
        )
    )
