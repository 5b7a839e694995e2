"""``appx_median_bounded`` — bounded-memory approximate median.

Re-implements the reference library's one aggregate function
(reference ``median.h:27-29``, ``median.cc:45-47``): an approximate median
computed by weighted reservoir sampling with a caller-supplied cap
(``max_samples``) on aggregation-state memory.

Three implementations behind one name, chosen by context:

1. **Production / 100 TB path** — :func:`appx_median_bounded`: a thin wrapper
   over Spark's built-in ``percentile_approx`` (JVM-side, whole-stage
   codegen-eligible, true partial+final aggregation with bounded
   QuantileSummaries state). ``accuracy`` plays the role of ``max_samples``
   as the memory/precision knob.

2. **Reference-faithful SQL UDAF** — :func:`make_appx_median_bounded_udf`:
   a pandas grouped-agg UDF with the reference's exact semantics:
   NULL values are skipped (``median.cc:130``), empty input yields SQL NULL
   (``median.cc:295-298``), even-count groups return the *upper* median
   ``sorted(vals)[n // 2]`` with no interpolation (``median.cc:301``), and
   ``max_samples`` ratchets up, never down (``median.cc:157-162``).

3. **Scalable faithful operator** — :class:`ReservoirState` powers the
   two-phase ``mapInPandas``/``applyInPandas`` operator in
   :mod:`rocana_impala_udfs_spark.operators.reservoir`, which reproduces the
   full distributed five-phase protocol (init/update/serialize/merge/finalize,
   ``median.cc:117-304``) with map-side partial aggregation, so only
   ``max_samples`` values per group per partition cross the shuffle.

Randomness: the reference uses boost ``ranlux64_3`` + ``rand()``
(``median.cc:105,190``); bit-parity is impossible and not a goal (reference
``median-test.cc:30-31`` uses fuzzy comparison for the same reason). We use
numpy's PCG64 with a fixed default seed so test runs are reproducible, and the
result is *exact* (hence deterministic) whenever ``n <= max_samples``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf, pandas_udf

DEFAULT_SEED = 42

# ---------------------------------------------------------------------------
# Production path: percentile_approx wrapper
# ---------------------------------------------------------------------------


def appx_median_bounded(col: Column | str, max_samples: int) -> Column:
    """Bounded-memory approximate median, production path.

    Maps the reference's ``max_samples`` memory cap onto
    ``percentile_approx``'s ``accuracy`` knob (both bound aggregation-state
    size; larger = more precise). Fully codegen-eligible and plans as
    partial+final ``HashAggregate`` — the implementation to use at scale.
    """
    accuracy = max(int(max_samples), 100)
    return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))


def appx_median_bounded_str(col: Column | str, max_samples: int) -> Column:
    """Reference-compatible variant returning STRING.

    The reference returns the median serialized as decimal text
    (``median.cc:303``) because Impala <2.0 lacked separate intermediate
    types; users apply ``CAST(... AS DOUBLE)`` (reference ``README.md:61``).
    """
    return appx_median_bounded(col, max_samples).cast("string")


# ---------------------------------------------------------------------------
# Faithful reservoir state — the five-phase protocol as a Python object
# ---------------------------------------------------------------------------


class ReservoirState:
    """Weighted reservoir-sampling aggregation state.

    Port of ``ReservoirSampleState<DoubleVal>`` (reference ``median.cc:88-111``):
    bounded sample buffer, ``source_size`` row counter, and weight keys in
    ``[0, 1]`` (``-1`` = not yet assigned, ``median.cc:58-59``). Spark/Arrow
    handle serialization, so the reference's manual buffer management
    (``median.cc:113-115, 138-141``) has no equivalent here — only the
    semantic content survives.
    """

    __slots__ = ("vals", "keys", "max_samples", "source_size", "rng")

    def __init__(self, max_samples: int, seed: int = DEFAULT_SEED):
        if max_samples <= 0:
            raise ValueError("max_samples must be positive")
        self.vals: np.ndarray = np.empty(0, dtype=np.float64)
        self.keys: np.ndarray = np.empty(0, dtype=np.float64)  # -1 => unkeyed
        self.max_samples = int(max_samples)
        self.source_size = 0
        self.rng = np.random.default_rng(seed)

    # -- update: Algorithm-R accumulate (median.cc:128-163) -----------------

    def update(
        self,
        values: np.ndarray,
        max_samples: int | None = None,
        null_mask: np.ndarray | None = None,
    ) -> None:
        """Absorb a batch of non-null values (vectorized Algorithm R).

        The first ``max_samples`` values fill the reservoir
        (``median.cc:149-150``); after saturation, the *i*-th observed value
        replaces a uniformly random slot with probability ``max_samples / i``
        (``median.cc:151-153``). ``max_samples`` ratchets up, never down
        (``median.cc:157-162``).

        NULL skip (``median.cc:130``): when ``null_mask`` is given (True =
        SQL NULL) only genuine NULLs are dropped and NaN *data* values are
        sampled like any double — exactly the reference (which skips only
        ``is_null``, ``median.cc:130-131``) and the JVM UDAF
        (``AppxMedianBounded.java:61``, ``Double.compare`` total order, NaN
        sorts last — as does ``np.sort``). The registered SQL UDAFs pass
        this mask since r10 (they receive ``pyarrow.Array`` batches, whose
        validity bitmap distinguishes NULL from NaN), closing the r9
        NaN-divergence note. Without a mask (legacy pandas callers, where
        the Arrow→pandas bridge conflates NULL and NaN into NaN) all NaN
        are dropped — fine for every NaN-free fixture and driver key, and
        pinned as the documented fallback in tests/test_median.py.
        """
        if max_samples is not None and int(max_samples) > self.max_samples:
            self.max_samples = int(max_samples)
        values = np.asarray(values, dtype=np.float64)
        if null_mask is not None:
            values = values[~np.asarray(null_mask, dtype=bool)]
        else:
            values = values[~np.isnan(values)]
        if values.size == 0:
            return
        k = self.max_samples
        pos = 0
        if self.vals.size < k:
            take = min(k - self.vals.size, values.size)
            self.vals = np.concatenate([self.vals, values[:take]])
            self.keys = np.concatenate([self.keys, np.full(take, -1.0)])
            self.source_size += take
            pos = take
        rest = values[pos:]
        if rest.size:
            # Row indices (1-based stream position) for the remaining values.
            idx = self.source_size + 1 + np.arange(rest.size, dtype=np.int64)
            accept = self.rng.integers(0, idx) < k  # P(accept) = k / i
            hit = np.nonzero(accept)[0]
            if hit.size:
                slots = self.rng.integers(0, k, size=hit.size)
                # Sequential semantics: later rows overwrite earlier ones.
                self.vals[slots] = rest[hit]
                self.keys[slots] = -1.0
            self.source_size += int(rest.size)

    # -- serialize: assign weight keys (median.cc:165-194) ------------------

    def assign_keys(self) -> None:
        """Give unkeyed samples keys approximating the top-``num_samples``
        keys of a ``source_size``-row weighted reservoir:
        ``key = (source_size - r) / source_size`` with ``r`` uniform in
        ``[0, num_samples)`` (``median.cc:176-192``) — so larger partitions
        win merges proportionally.
        """
        n = self.vals.size
        if n == 0 or self.source_size == 0:
            return
        unkeyed = self.keys < 0
        m = int(unkeyed.sum())
        if m:
            r = self.rng.integers(0, n, size=m).astype(np.float64)
            self.keys[unkeyed] = (self.source_size - r) / self.source_size

    # -- merge: key-weighted combine (median.cc:228-282) --------------------

    def merge(self, other: "ReservoirState") -> None:
        """Combine two keyed partials: keep the ``max_samples`` samples with
        the largest keys (the reference maintains a min-heap on key and
        evicts the minimum, ``median.cc:263-280``); ``max_samples`` is the
        max of the two (``median.cc:242-254``), ``source_size`` sums
        (``median.cc:281``).
        """
        self.max_samples = max(self.max_samples, other.max_samples)
        vals = np.concatenate([self.vals, other.vals])
        keys = np.concatenate([self.keys, other.keys])
        k = self.max_samples
        if vals.size > k:
            top = np.argpartition(keys, vals.size - k)[-k:]
            vals, keys = vals[top], keys[top]
        self.vals, self.keys = vals, keys
        self.source_size += other.source_size

    # -- finalize: upper median (median.cc:284-304) -------------------------

    def finalize(self) -> float | None:
        """Empty input => SQL NULL (``median.cc:295-298``); else sort by value
        and return the element at index ``n // 2`` — the *upper* median for
        even counts, no interpolation (``median.cc:299-301``).
        """
        return self.finalize_percentile(0.5)

    def finalize_percentile(self, p: float) -> float | None:
        """Generalization of the reference's finalize rule to any p in
        [0, 1]: element at index ``min(floor(n*p), n-1)`` of the sorted
        sample — for p=0.5 this IS ``n // 2``, the reference's upper-median
        convention (``median.cc:299-301``); no interpolation, always an
        actual data element."""
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile p must be in [0, 1], got {p}")
        if self.vals.size == 0:
            return None
        idx = min(int(np.floor(self.vals.size * p)), self.vals.size - 1)
        return float(np.sort(self.vals)[idx])

    def sample_values(self) -> np.ndarray:
        return self.vals.copy()


# ---------------------------------------------------------------------------
# Faithful SQL UDAF (pandas grouped-agg)
# ---------------------------------------------------------------------------


def _group_state(x, k) -> ReservoirState:
    """Build the per-group reservoir from Arrow arrays (x = values,
    k = per-row max_samples). The Arrow validity bitmap distinguishes SQL
    NULL from NaN data, so NULLs are skipped and NaN is sampled — the
    reference's exact rule (``median.cc:130-131``) and bit-for-bit the JVM
    UDAF's behavior (``AppxMedianBounded.java:61``)."""
    import pyarrow.compute as pc

    ks = np.asarray(k.drop_null(), dtype=np.float64)
    max_samples = int(ks.max()) if ks.size else 100
    state = ReservoirState(max_samples)
    vals = x.to_numpy(zero_copy_only=False)
    mask = pc.is_null(x, nan_is_null=False).to_numpy(zero_copy_only=False)
    state.update(vals, null_mask=mask)
    return state


def _median_of_group(x, k) -> float | None:
    return _group_state(x, k).finalize()


def make_appx_median_bounded_udf():
    """Grouped-agg pandas UDF with the reference signature
    ``(DOUBLE, INT) -> DOUBLE``.

    Mirrors the reference's tolerance of a per-row ``max_samples`` argument
    ("checking for constant values isn't working", ``median.cc:135-137``) by
    taking the max seen in the group — the ratchet rule of
    ``median.cc:157-162``. Exact (and deterministic) whenever the group has
    at most ``max_samples`` non-null rows, matching ``median-test.cc:66-82``.

    Note: Spark feeds a grouped-agg pandas UDF the whole group (no partial
    aggregation). Fine for moderate groups; for 100 TB use
    :func:`appx_median_bounded` or the two-phase operator in
    ``operators/reservoir.py``.

    r10: grouped-agg **arrow_udf** (Spark 4.1) instead of pandas_udf — the
    ``pyarrow.Array`` input keeps the validity bitmap, so SQL NULL and NaN
    data are distinguished and NaN is sampled exactly like the reference
    and the JVM path (parity pinned in tests/test_median.py).
    """

    @arrow_udf("double")
    def appx_median_bounded_udf(x: pa.Array, k: pa.Array) -> float:
        return _median_of_group(x, k)

    return appx_median_bounded_udf


def make_appx_median_bounded_str_udf(cpp_format: bool = False):
    """STRING-returning variant for exact reference DDL compatibility
    (``(DOUBLE, INT) RETURNS STRING``, reference ``README.md:40``).

    Default formatting divergence, pinned in tests/test_median.py: the
    reference's ``ToStringVal`` (``median.cc:29-37``) uses default
    ``stringstream`` formatting — 6 significant digits — so its string LOSES
    precision. We return ``repr(float)`` (shortest round-trip form) so the
    documented ``CAST(appx_median_bounded(x, k) AS DOUBLE)`` idiom recovers
    the exact double.

    ``cpp_format=True`` opts into byte-level ``stringstream`` parity:
    ``operator<<(double)`` with the default precision(6) prints like C's
    ``%g`` with 6 significant digits ("500", "51504.4", "1e+07") — Python's
    ``%.6g`` is the same algorithm (shortest-of-fixed/scientific, trailing
    zeros stripped), so the bytes match the C++ output."""

    @arrow_udf("string")
    def appx_median_bounded_str_udf(x: pa.Array, k: pa.Array) -> str:
        m = _median_of_group(x, k)
        if m is None:
            return None
        return "%.6g" % m if cpp_format else repr(m)

    return appx_median_bounded_str_udf


def make_appx_percentile_bounded_udf():
    """``appx_percentile_bounded(x, p, k) -> DOUBLE``: the reference's
    bounded reservoir generalized to any percentile (finalize picks
    sorted[min(floor(n*p), n-1)]; p=0.5 reproduces ``appx_median_bounded``
    exactly). ``p`` is a per-call constant column (max over the group, like
    the k ratchet)."""

    @arrow_udf("double")
    def appx_percentile_bounded_udf(x: pa.Array, p: pa.Array, k: pa.Array) -> float:
        ps = np.asarray(p.drop_null(), dtype=np.float64)
        pct = float(ps.max()) if ps.size else 0.5
        # finalize_percentile also validates; check here so a bad SQL
        # literal fails with the argument name, not an index error
        if not 0.0 <= pct <= 1.0:
            raise ValueError(f"percentile p must be in [0, 1], got {pct}")
        return _group_state(x, k).finalize_percentile(pct)

    return appx_percentile_bounded_udf


def serialize_reservoir_state(state: ReservoirState) -> list:
    """Flat ARRAY<DOUBLE> encoding of the aggregation state — the analog of
    the reference's serialize-to-StringVal at the shuffle boundary
    (``median.cc:165-194``): ``[max_samples, source_size, n, v1..vn,
    key1..keyn]``. Weight keys are assigned before encoding, exactly as the
    reference keys unkeyed samples at serialize time."""
    state.assign_keys()
    vals = state.sample_values()
    return (
        [float(state.max_samples), float(state.source_size), float(vals.size)]
        + vals.tolist()
        + state.keys.tolist()
    )


def deserialize_reservoir_state(flat) -> ReservoirState:
    """Inverse of :func:`serialize_reservoir_state`."""
    arr = np.asarray(flat, dtype=np.float64)
    max_samples, source_size, n = int(arr[0]), int(arr[1]), int(arr[2])
    st = ReservoirState(max_samples)
    st.vals = arr[3 : 3 + n].copy()
    st.keys = arr[3 + n : 3 + 2 * n].copy()
    st.source_size = source_size
    return st


def make_reservoir_partial_udf():
    """``reservoir_partial(x, k) -> ARRAY<DOUBLE>`` — the UPDATE+SERIALIZE
    half of the reference's five-phase protocol (``median.cc:128-194``)
    exposed to SQL, so the documented DDL surface gets a genuinely scalable
    two-statement form (see :func:`make_reservoir_merge_median_udf`).

    Spark's grouped-agg pandas UDFs ship whole groups to one worker; the
    scalable SQL idiom bounds every such group by salting the first GROUP BY
    (``GROUP BY grp, pmod(hash(id), S)``), then merging the ≤ S bounded
    states per group in a second aggregate — the same
    partial/serialize/merge shape as ``operators/reservoir.py``, with
    intermediate state ≤ S × max_samples values per group regardless of
    input row count."""

    @arrow_udf("array<double>")
    def reservoir_partial_udf(x: pa.Array, k: pa.Array) -> list:
        return serialize_reservoir_state(_group_state(x, k))

    return reservoir_partial_udf


def make_reservoir_merge_median_udf():
    """``reservoir_merge_median(state) -> DOUBLE`` — the MERGE+FINALIZE half
    (``median.cc:228-304``): key-weighted combine of serialized partials from
    :func:`make_reservoir_partial_udf`, then the reference's upper-median
    finalize (empty ⇒ NULL, no interpolation)."""

    @pandas_udf("double")
    def reservoir_merge_median_udf(states: pd.Series) -> float:
        merged: ReservoirState | None = None
        for flat in states:
            if flat is None:
                continue
            st = deserialize_reservoir_state(flat)
            if merged is None:
                merged = st
            else:
                merged.merge(st)
        return None if merged is None else merged.finalize()

    return reservoir_merge_median_udf


def make_reservoir_sample_udf():
    """The underlying primitive exposed directly:
    ``reservoir_sample(x, k) -> ARRAY<DOUBLE>`` — a bounded uniform sample of
    the group's non-null values (sorted for determinism of the unsaturated
    case). Reusable building block the reference keeps internal."""

    @arrow_udf("array<double>")
    def reservoir_sample_udf(x: pa.Array, k: pa.Array) -> list:
        # np.sort (not Python sorted): NaN data values sort last, matching
        # Double.compare / the reference's total order.
        return np.sort(_group_state(x, k).sample_values()).tolist()

    return reservoir_sample_udf


# ---------------------------------------------------------------------------
# Exact upper median as a relational composition (typed generalization)
# ---------------------------------------------------------------------------


def truncate_bytes(col: Column | str, n: int = 10) -> Column:
    """The reference's string-sample truncation (``median.cc:49,67-86``):
    ``ReservoirSample<StringVal>`` keeps only the first
    ``MAX_STRING_SAMPLE_LEN = 10`` BYTES of each sampled string, so ordering
    and the returned median are over truncated values. Byte semantics, not
    codepoints: we slice the UTF-8 ``binary`` form, so a multi-byte char cut
    at the boundary yields a replacement char on decode (the closest a
    STRING column gets to the reference's raw ``uint8_t val[10]``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("binary"), 1, n).cast("string")


def exact_weighted_upper_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    out: str = "wmedian",
) -> DataFrame:
    """Weighted generalization of the reference's upper-median rule: with
    positive integer weights, pick the smallest value whose CUMULATIVE
    weight reaches ``W//2 + 1`` — at unit weights this is exactly the
    element at sorted position ``n//2`` (``median.cc:301``), so the
    unweighted operator is the w≡1 special case.

    The cumulative weight is strictly increasing, so exactly one row per
    group satisfies ``cw - w < thr <= cw``; value ties don't affect the
    output (tied rows share the value).  Integer weights keep the
    threshold arithmetic exact in any engine.  Scale shape: weights
    collapse onto the DISTINCT-value frame first, so the cumulative
    window never sees raw-row cardinality (see
    :func:`exact_weighted_quantile`).
    """
    return exact_weighted_quantile(df, value_col, weight_col, 1, 2, group_cols, out)


def exact_weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    p_num: int,
    p_den: int,
    group_cols: list[str] | None = None,
    out: str = "wquantile",
) -> DataFrame:
    """Weighted quantile at the RATIONAL probability ``p_num/p_den`` with
    the upper-pick rule: smallest value whose cumulative integer weight
    reaches ``(p_num·W)//p_den + 1``.  At 1/2 this is
    :func:`exact_weighted_upper_median`; a rational p keeps the threshold
    in exact BIGINT arithmetic (a float p would put an ulp on the pick
    boundary).

    Scale shape (r7): weights first collapse onto the per-group
    DISTINCT-value frame (rows tied on value merge their weights — the
    threshold-crossing value is unchanged because the crossing rule only
    sees cumulative weight at value granularity), so the cumulative
    window runs over the value-domain-bounded frame, never raw rows, and
    the intra-tie cumulative ordering ambiguity disappears."""
    if not (0 < p_num < p_den):
        raise ValueError(f"need 0 < p_num/p_den < 1, got {p_num}/{p_den}")
    group_cols = group_cols or []
    part = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    w_cum = part.orderBy(F.col(value_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filtered = df.filter(
        F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
    )
    per_v = filtered.groupBy(*group_cols, value_col).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("_w")
    )
    ranked = per_v.select(
        *group_cols,
        F.col(value_col),
        "_w",
        F.sum("_w").over(w_cum).alias("_cw"),
        F.sum("_w").over(part).alias("_tw"),
    )
    thr = F.expr(f"div({p_num} * _tw, {p_den})") + 1
    picked = ranked.filter((F.col("_cw") >= thr) & (F.col("_cw") - F.col("_w") < thr))
    return picked.select(*group_cols, F.col(value_col).alias(out))


def exact_upper_median(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out: str = "median",
) -> DataFrame:
    """Exact median with the reference's upper-median rule, for ANY orderable
    type (the generalization the reference signposts via its
    ``SampleValLess`` comparators for DECIMAL/TIMESTAMP/STRING,
    ``median.cc:196-221``, but never wires up).

    Pure relational composition — ``row_number``/``count`` windows, picks the
    element at sorted position ``n // 2`` (0-based; ``median.cc:301``).
    Distributed as a per-group sort; exact medians fundamentally need the
    sort, the approx paths above avoid it.
    """
    group_cols = group_cols or []
    part = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy(F.lit(1))
    w_rank = part.orderBy(F.col(value_col))
    filtered = df.filter(F.col(value_col).isNotNull())
    ranked = filtered.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(part).alias("_n"),
    )
    picked = ranked.filter(F.col("_rn") == (F.col("_n") / 2).cast("int") + 1)
    return picked.select(*group_cols, F.col(value_col).alias(out))
