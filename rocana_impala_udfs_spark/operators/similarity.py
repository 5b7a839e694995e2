"""Similarity search over embedding columns (``embeddings.embedding``,
``ARRAY<FLOAT>``).

Two paths, per the scale doctrine:

- **Brute force** — exact cosine top-k per query vector. Correctness
  baseline and the oracle-checkable path. Cross-join cost O(|Q|·n): fine for
  small query sets even at large n (broadcast the queries), wrong for
  all-pairs at 100 TB.
- **LSH-bucketed** — random-hyperplane sign buckets (Charikar SimHash for
  vectors): candidates = bucket collisions across ``num_tables`` independent
  tables, then exact cosine re-rank on candidates only. Recall < 1 by
  construction; tested against brute force, not the oracle.

Cosine is computed JVM-side in double precision via zip_with/aggregate —
no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rocana_impala_udfs_spark.operators.topk import grouped_topk_two_phase


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<numeric> columns, double precision."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def cosine_sim_named(a_name: str, b_name: str) -> Column:
    """:func:`cosine_sim` for plainly-named columns, built as ONE parsed SQL
    expression (r17, VERDICT r16 #6 — driver-side plan-build cost): the
    Column-API form issues ~30 py4j round trips per call site (each lambda
    HOF is several), which adds up on the scorecard keys that embed three
    re-rank chains per build. The expression tree is identical — same HOF
    composition, same fold order, same ``0.0D`` double accumulator seed —
    so every value is bit-for-bit the Column form's (pinned in
    tests/test_pipeline.py)."""

    def tf(col: str) -> str:
        return f"transform({col}, x -> CAST(x AS DOUBLE))"

    def sq(col: str) -> str:
        return (
            f"sqrt(aggregate(transform({tf(col)}, x -> x * x), 0.0D,"
            " (acc, x) -> acc + x))"
        )

    dot = (
        f"aggregate(zip_with({tf(a_name)}, {tf(b_name)}, (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    return F.expr(f"{dot} / ({sq(a_name)} * {sq(b_name)})")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (small side); candidates ranked by exact cosine
    with deterministic id tiebreak. Returns (query_id, neighbor_id, cos, rk).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim_named("q_vec", "n_vec").alias("_cos"),
        )
    )
    # Per-probe ranking goes through the two-phase salted top-k: a plain
    # row_number() OVER (PARTITION BY query_id) sorts the WHOLE corpus in
    # one task per probe at scale. The merge property (global top-k of a
    # union ⊆ union of per-salt top-k's under the same total order) keeps
    # the result — and the oracle — identical (VERDICT r7 #2).
    return _final_topk(scored, k)


def _final_topk(scored: DataFrame, k: int, score_col: str = "_cos") -> DataFrame:
    """Exact per-probe top-k over (query_id, neighbor_id, _cos) candidate
    rows with both sort passes bounded; emits the ANN output contract
    (query_id, neighbor_id, cos=round(_cos,4), rk)."""
    topk = grouped_topk_two_phase(
        scored,
        ["query_id"],
        [F.col(score_col).desc(), F.col("neighbor_id")],
        k,
        salt_col=F.xxhash64("neighbor_id"),
    )
    return topk.select(
        "query_id", "neighbor_id", F.round(score_col, 4).alias("cos"), "rk"
    )


def brute_force_topk_np(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors, BLAS path.

    The query matrix (small side) is collected once and closed over into a
    ``mapInPandas`` kernel: each Arrow batch of vectors does ONE
    float64 matmul against all queries — vectorized math instead of
    per-element interpreted expressions, ~5× faster than the higher-order-
    function composition and the shape that scales (per-executor BLAS over
    Arrow batches, queries broadcast in the closure, zero shuffle before
    the final per-query top-k). Same output contract as
    :func:`brute_force_topk`.
    """
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    if dims is not None:
        # matryoshka-style PREFIX truncation: cosine over the first
        # `dims` components (norms recomputed on the prefix)
        Q = Q[:, :dims]
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if dims is not None:
                V = V[:, :dims]
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ Qn.T  # (batch, n_queries)
            n_ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "neighbor_id": np.repeat(n_ids, len(q_ids)),
                    "query_id": np.tile(q_ids, len(n_ids)),
                    "_cos": sims.ravel(),
                }
            )
            yield out[out.neighbor_id != out.query_id]

    # NOTE (r17): widening the narrow fixture scan here (ensure_parallelism)
    # was tried and REVERTED — the corpus sweep is only ~0.3-0.7 s in one
    # task at sf0.1, and the added round-robin exchange + 32-way Python
    # dispatch on sub-1k-row batches measured a consistent net regression
    # (ann_lsh_top5 1.9 → 3.5 s min-of-3). On a wide production scan the
    # kernel already parallelizes via the scan splits.
    scored = vectors.select(id_col, vec_col).mapInPandas(
        score, schema="neighbor_id bigint, query_id bigint, _cos double"
    )
    # two-phase salted top-k: no single task ever sorts the whole corpus
    return _final_topk(scored.select("query_id", "neighbor_id", "_cos"), k)


def brute_force_topk_np_multi(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims_list: tuple[int, ...] = (8, 16, 32, 64),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Every prefix-truncation sweep of :func:`brute_force_topk_np` in ONE
    corpus pass (r17, guide §2.4/§4.1): the matryoshka recall curve needs
    the exact top-k at several truncated dimensionalities, and running the
    per-``dims`` kernel separately re-scans and re-crosses the corpus once
    per prefix. Each Arrow batch is loaded once and scored at every prefix
    — per-prefix math is IDENTICAL to ``brute_force_topk_np(dims=d)``
    (same ``V[:, :d]`` slice, same norm guard, same matmul), so every
    (dim, query, neighbor, cos) is bit-for-bit the single-sweep value.
    Output adds a leading ``dim`` column; the per-(dim, query) top-k goes
    through the same two-phase salted rank."""
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q_full = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    Qn = {}
    for d in dims_list:
        Qd = Q_full[:, :d]
        Qn[d] = Qd / np.maximum(np.linalg.norm(Qd, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            V_full = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n_ids = pdf[id_col].to_numpy()
            n_pairs = len(n_ids) * len(q_ids)
            rep_ids = np.repeat(n_ids, len(q_ids))
            tile_ids = np.tile(q_ids, len(n_ids))
            for d in dims_list:
                V = V_full[:, :d]
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
                sims = Vn @ Qn[d].T  # (batch, n_queries)
                out = pd.DataFrame(
                    {
                        "dim": np.full(n_pairs, d, dtype=np.int32),
                        "neighbor_id": rep_ids,
                        "query_id": tile_ids,
                        "_cos": sims.ravel(),
                    }
                )
                yield out[out.neighbor_id != out.query_id]

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score, schema="dim int, neighbor_id bigint, query_id bigint, _cos double"
    )
    topk = grouped_topk_two_phase(
        scored.select("dim", "query_id", "neighbor_id", "_cos"),
        ["dim", "query_id"],
        [F.col("_cos").desc(), F.col("neighbor_id")],
        k,
        salt_col=F.xxhash64("neighbor_id"),
    )
    return topk.select(
        "dim", "query_id", "neighbor_id", F.round("_cos", 4).alias("cos"), "rk"
    )


def random_hyperplanes(dim: int, num_tables: int, bits_per_table: int, seed: int = 42) -> np.ndarray:
    """(num_tables, bits_per_table, dim) Gaussian hyperplane normals."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_tables, bits_per_table, dim))


def _hyperplane_bucket_udf(planes, dim: int, num_tables: int, bits_per_table: int):
    """Arrow-batched sign-bucket kernel over broadcast hyperplane constants,
    shared by the LSH top-k and embedding near-dup operators. Each dot
    product accumulates with an explicit per-dimension sequential loop
    (``s += X[:,d]·w[d]``, vectorized across rows) — the identical IEEE
    operation order as a left-to-right fold, so every sign bit matches
    both the SQL-literal oracles and the earlier per-row HOF formulation
    bit-for-bit; BLAS dots would reorder the sum and risk sign flips near
    zero (the r6 lesson)."""
    n_planes = num_tables * bits_per_table
    P = planes.reshape(n_planes, dim).T.copy()  # (dim, n_planes)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        if X.ndim != 2 or X.shape[0] == 0:
            return pd.Series([], dtype=object)
        s = np.zeros((X.shape[0], n_planes), dtype=np.float64)
        for d in range(dim):  # sequential in d => fold-order-exact sums
            s += X[:, d : d + 1] * P[d][None, :]
        bits = s >= 0
        out = np.zeros((X.shape[0], num_tables), dtype=np.int32)
        for t in range(num_tables):
            for b in range(bits_per_table):
                out[:, t] |= bits[:, t * bits_per_table + b].astype(np.int32) << b
        return pd.Series(out.tolist())

    return bucket_ids


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    num_tables: int = 16,
    bits_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets → candidate join →
    exact cosine re-rank.

    Bucket ids are ``bits_per_table``-bit sign patterns computed in an
    Arrow-batched kernel from the broadcast hyperplane constants. The
    kernel accumulates each dot product with an explicit per-dimension
    sequential loop (``s += X[:,d]·w[d]``, vectorized across rows) — the
    identical IEEE operation order as a left-to-right fold, so every sign
    bit matches the SQL-literal oracle (lsh_oracle_sql) bit-for-bit; BLAS
    dot products would reorder the sum and risk sign flips near zero.
    (An earlier all-JVM formulation via nested higher-order functions was
    interpreted per element — ~4k lambda evals per row — and 10× slower.)
    Shuffle is the bucket equality join — no cross join anywhere.
    """
    planes = random_hyperplanes(dim, num_tables, bits_per_table, seed)
    bucket_ids = _hyperplane_bucket_udf(planes, dim, num_tables, bits_per_table)

    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    vb = v.select("neighbor_id", "n_vec", bucket_ids(F.col("n_vec")).alias("bks"))
    qb = q.select("query_id", "q_vec", bucket_ids(F.col("q_vec")).alias("bks"))
    # Candidate generation carries ONLY ids through the multi-table explode
    # and dedup: a distinct over rows holding two dim-sized float arrays
    # shuffles and compares the vectors themselves (measured 4× the whole
    # query at sf0.1). Ids dedup cheaply; vectors re-attach afterwards —
    # neighbors by keyed join, queries by broadcast.
    #
    # The (tbl, bkt) stack is ONE parsed SQL expression instead of ~100
    # per-table Column objects (r17, VERDICT r16 #6): each Column op is a
    # py4j round trip, and the old per-table struct/array construction
    # measured ~1 s of driver-side plan-build time per call. `bks[t]` is
    # the same 0-based array subscript the Column form used; the analyzed
    # plan is identical.
    stack_expr = (
        "explode(array("
        + ", ".join(
            f"named_struct('tbl', {t}, 'bkt', bks[{t}])" for t in range(num_tables)
        )
        + ")) AS tb"
    )
    v_stack = vb.selectExpr("neighbor_id", stack_expr).select(
        "neighbor_id", "tb.tbl", "tb.bkt"
    )
    q_stack = qb.selectExpr("query_id", stack_expr).select(
        "query_id", "tb.tbl", "tb.bkt"
    )
    pairs = (
        v_stack.join(F.broadcast(q_stack), ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    candidates = pairs.join(v, "neighbor_id").join(F.broadcast(q), "query_id")
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        candidates.select(
            "query_id", "neighbor_id", cosine_sim_named("q_vec", "n_vec").alias("_cos")
        )
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos"), F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def train_centroids(
    vectors: DataFrame,
    nlist: int = 16,
    dim: int = 64,
    sample_size: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Driver-side k-means on a bounded sample — the IVF 'train' step.

    The sample is capped at ``sample_size`` rows regardless of table size
    (Spark's ``takeSample`` runs a distributed reservoir pass), so driver
    memory stays O(sample × dim) at any scale. Lloyd iterations in numpy;
    empty clusters re-seeded deterministically from the sample.
    """
    sample = vectors.select(vec_col).rdd.map(lambda r: r[0]).takeSample(False, sample_size, seed)
    X = np.asarray(sample, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine == dot on unit vectors
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
            else:
                C[c] = X[rng.integers(len(X))]
    return C


def _assign_clusters_udf(centroids: np.ndarray, nprobe: int):
    """Pandas UDF: vector -> nprobe nearest centroid ids (dot product on
    normalized inputs, vectorized per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.astype(np.float64)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return assign


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: vectors live in 1 centroid bucket each; a query
    probes its ``nprobe`` nearest buckets and exact-cosine re-ranks only the
    candidates there. Search cost drops to ~nprobe/nlist of brute force; the
    bucket equality join is the only shuffle. Recall < 1 by construction —
    tested against brute force (no SQL oracle).

    ``nprobe`` defaults to 8 (VERDICT r15 #3 — the old 4 measured recall@5
    0.62 against a >=0.6 band, a one-fixture-away margin). At the 500-vector
    sf0.01 fixture the measured curve is 0.48 / 0.62 / 0.75 / 0.84 at nprobe
    2/4/6/8 (nlist=16): Lloyd buckets on isotropic synthetic embeddings
    carry limited NN signal, so recall grows near-linearly with the probed
    fraction plus a ~+0.35 clustering bonus. nprobe=8 sits at 0.84 against
    the re-tightened >=0.7 band. The 8/16 probed FRACTION is a fixture
    artifact, not the scale story: at corpus scale nlist grows ~sqrt(n)
    (occupancy-bounded buckets), so the same nprobe=8 probes 8/4096 of a
    16M-vector index while per-query candidate cost stays ~nprobe*occupancy
    — the recall/cost dial is nprobe, and raising it never changes the
    plan shape (still one explode + one broadcast-bucket equality join)."""
    C = train_centroids(vectors, nlist, dim, seed=seed, vec_col=vec_col) if centroids is None else centroids
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v_assigned = v.withColumn(
        "cluster", F.element_at(_assign_clusters_udf(C, 1)(F.col("n_vec")), 1)
    )
    q_assigned = q.withColumn(
        "cluster", F.explode(_assign_clusters_udf(C, nprobe)(F.col("q_vec")))
    )
    candidates = (
        v_assigned.join(F.broadcast(q_assigned), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "n_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        candidates.select(
            "query_id", "neighbor_id", cosine_sim_named("q_vec", "n_vec").alias("_cos")
        )
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos"), F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 16,
    bits_per_table: int = 4,
    target_bucket_rows: int | None = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold) via the same
    hyperplane-bucket candidate generation as :func:`lsh_bucket_topk`,
    verified with exact cosine.

    r12 rewrite (found by the derived-sf1x sweep): the original per-row
    HOF bucket expressions and vector-carrying ``distinct`` let Catalyst
    push the interpreted cosine INTO the bucket join condition — every
    candidate pair paid an interpreted 64-dim fold once per co-occurring
    table (up to 16×), ~50 billion lambda evals at sf≈1 on two
    partitions. Now: buckets come from the shared Arrow kernel
    (bit-identical signs — same sequential IEEE fold order as the HOF
    chain), candidates dedup on IDS ONLY, vectors re-attach by keyed
    join, and the exact cosine (the same left-associative HOF chain, for
    oracle parity) runs exactly ONCE per distinct pair.

    r14 (found by the first honest 100× sweep point): with FIXED bucket
    geometry the candidate count is O(n² / 2^bits) — the 16-bucket tables
    that are exact and instant at oracle SF produce ~200M candidates at
    10× and ~20B at 100×. Like IVF's nlist, bucket granularity must grow
    with the corpus: when ``target_bucket_rows`` is set (default 64), the
    table bit-width becomes max(bits_per_table, ceil(log2(n /
    target_bucket_rows))), capped at 20 — expected bucket occupancy stays
    ~constant, so candidates are O(n·target·tables), linear. The recall
    trade is quantified, not hand-waved: a pair EXACTLY at cos=t collides
    per table with prob (1 − arccos(t)/π)^bits, so at t=0.95, bits=12,
    16 tables the boundary-pair miss rate is (1−0.899^12)^16 ≈ 0.54%,
    while true near-identical pairs (cos→1) miss with prob →0. The
    driver's oracle gates span both regimes (ADVICE r14 #2): at sf0.01
    (n=500 → ceil(log2(500/64)) = 3 ≤ 4) the floor geometry holds, while
    at sf0.1 (n=2000 → bits=5) the gate runs the ADAPTIVE regime against
    an exact brute-force oracle — sound because LSH recall at bits=5 is
    probabilistic only for pairs AT the threshold (miss ≈ 7e-7 per pair
    at cos=0.95), and the fixture has none; the kernel's nonzero-row
    value certification lives in ``emb_neardup_pairs_loose``, which is
    exact by construction (bounded brute-force, no LSH).
    ``target_bucket_rows=None`` restores fixed geometry.
    The one extra ``count()`` is a columnless scan — the standard
    statistics pass any size-adaptive physical plan needs."""
    if target_bucket_rows:
        import math

        n = vectors.count()
        bits_per_table = max(
            bits_per_table,
            min(20, math.ceil(math.log2(max(n / target_bucket_rows, 1.0)))),
        )
    planes = random_hyperplanes(dim, num_tables, bits_per_table, seed)
    bucket_ids = _hyperplane_bucket_udf(planes, dim, num_tables, bits_per_table)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    stacked = (
        v.select("id", bucket_ids(F.col("vec")).alias("bks"))
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("tbl"), F.col("bks")[t].alias("bkt"))
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        )
        .select("id", "tb.tbl", "tb.bkt")
    )
    x, y = stacked.alias("x"), stacked.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("i"), F.col("y.id").alias("j"))
        .distinct()
    )
    vi = v.select(F.col("id").alias("i"), F.col("vec").alias("vi"))
    vj = v.select(F.col("id").alias("j"), F.col("vec").alias("vj"))
    return (
        cand.join(vi, "i")
        .join(vj, "j")
        .select(
            "i",
            "j",
            # Arrow pair kernel, not the HOF chain: bit-identical by
            # construction (sequential per-dimension accumulation — see
            # _pair_cosine_udf) but numpy-speed; candidate sets are
            # |pairs|-sized and the per-pair interpreted fold was the
            # sf1x blowup class (r14, same move as the fixed twin).
            F.round(_pair_cosine_udf()(F.col("vi"), F.col("vj")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_pairs_exact(
    vectors: DataFrame,
    threshold: float = 0.35,
    id_max: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine pairs over a BOUNDED id range — the non-vacuous
    certification twin of :func:`embedding_neardup_pairs` (VERDICT r14
    #1): the production key's 0.95 threshold matches zero pairs in the
    synthetic fixtures, so its driver hash gate only ever compared empty
    sets; this key brute-forces all C(id_max, 2) pairs at a loose
    threshold so the Arrow pair-cosine kernel (:func:`_pair_cosine_udf`)
    is hash-certified against DuckDB ``list_cosine_similarity`` on REAL
    values (42 rows at sf0.01, 40 at sf0.1 with the 200/0.35 defaults —
    label-cluster relatives sit at cos ≈ 0.35–0.5 in these fixtures).

    No LSH, no recall question: every pair inside the range is compared.
    The id-range bound is what keeps that admissible — C(200,2) = 19,900
    pairs regardless of corpus size, so the broadcast side is bounded BY
    CONSTRUCTION (the one case the r13 broadcast rule allows) and the
    id filter is pushed into both parquet scans."""
    v = (
        vectors.filter(F.col(id_col) < id_max)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    )
    x, y = v.alias("x"), F.broadcast(v.alias("y"))
    return (
        x.join(y, F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("i"),
            F.col("y.id").alias("j"),
            F.round(_pair_cosine_udf()(F.col("x.vec"), F.col("y.vec")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means-cluster the
    embeddings (bounded driver-side training, ``train_centroids``), then
    exact-cosine compare only WITHIN each cluster. Pair-generation cost
    drops from O(n²) to O(Σ cluster²); near-identical vectors land in the
    same cluster except exactly on a centroid boundary, so recall < 1 by
    construction — tested against the oracle-exact brute-force pairs (no
    SQL oracle). The cluster-equality self-join is the only shuffle."""
    C = train_centroids(vectors, nlist, dim, seed=seed, vec_col=vec_col)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "cluster", F.element_at(_assign_clusters_udf(C, 1)(F.col("vec")), 1)
    )
    x, y = v.alias("x"), v.alias("y")
    return (
        x.join(y, (F.col("x.cluster") == F.col("y.cluster")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("i"),
            F.col("y.id").alias("j"),
            # Arrow pair kernel (bit-identical to the HOF chain, numpy
            # speed): with k ∝ corpus the within-cluster pair count is
            # ~125·n, and the interpreted per-pair fold dominated the
            # trained path's 10× time before r14.
            F.round(_pair_cosine_udf()(F.col("x.vec"), F.col("y.vec")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _pair_cosine_udf():
    """Vectorized exact cosine over PAIR rows (va, vb) — accumulates dot
    and the two squared norms with the per-dimension SEQUENTIAL loop, so
    every output double is bit-identical to the left-associative HOF
    chain in :func:`cosine_sim` (and to DuckDB ``list_cosine_similarity``
    — the parity `ORACLE_EMB_NEARDUP` certifies), at numpy speed instead
    of one interpreted lambda per element.  For candidate sets the HOF
    cost is quadratic in cluster/bucket size — the sf1x blowup class —
    while this kernel is the same arithmetic at C speed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pcos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.asarray(va.tolist(), dtype=np.float64)
        B = np.asarray(vb.tolist(), dtype=np.float64)
        if A.ndim != 2 or A.shape[0] == 0:
            return pd.Series([], dtype=np.float64)
        dot = np.zeros(A.shape[0])
        na = np.zeros(A.shape[0])
        nb = np.zeros(A.shape[0])
        for d in range(A.shape[1]):  # sequential: oracle-order-exact
            dot += A[:, d] * B[:, d]
            na += A[:, d] * A[:, d]
            nb += B[:, d] * B[:, d]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return pcos


def semantic_dedup_fixed_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with a FROZEN codebook — the oracle-EXACT twin of
    :func:`semantic_dedup_pairs`, completing the trained/frozen pairing
    the IVF family established (``ann_ivf_top5`` keeps the
    corpus-trained, recall-tested path; ``ann_ivf_fixed_top5`` carries
    the cross-engine hash gate).  Production SemDeDup loads pretrained
    centroids exactly like this and only runs ASSIGN + within-cluster
    compare in the data path.

    Cluster assignment uses the shared sequential-IEEE kernel
    (:func:`_fixed_assign_udf`), bit-reproducible as SQL literal sum
    chains; pair generation is one cluster-equality self-join (O(Σ
    cluster²), never O(n²)); the exact cosine runs once per pair through
    the Arrow pair kernel (:func:`_pair_cosine_udf` — HOF-chain
    bit-parity at numpy speed; per-pair interpreted folds are the sf1x
    blowup class) and the threshold compares the ROUNDED value on both
    engines."""
    C = fixed_ivf_centroids(nlist, dim)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "cluster", F.element_at(_fixed_assign_udf(C.T.copy(), 1)(F.col("vec")), 1)
    )
    x, y = v.alias("x"), v.alias("y")
    return (
        x.join(y, (F.col("x.cluster") == F.col("y.cluster")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("i"),
            F.col("y.id").alias("j"),
            F.round(_pair_cosine_udf()(F.col("x.vec"), F.col("y.vec")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup_fixed_oracle_sql(
    threshold: float = 0.95, nlist: int = 16, dim: int = 64
) -> str:
    """DuckDB twin of :func:`semantic_dedup_fixed_pairs`: the shared
    frozen-assignment CTE prefix (one generator with the IVF-fixed
    oracle — identical chains and tiebreak by construction),
    within-cluster pairs, rounded-cos threshold."""
    return f"""
WITH {_fixed_assign_cte_sql(nlist, dim)},
vv AS (SELECT vec_id, v, cluster FROM assigned WHERE prb = 1)
SELECT i, j, cos FROM (
    SELECT a.vec_id AS i, b.vec_id AS j,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM vv a JOIN vv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
) WHERE cos >= {threshold}
"""


def euclidean_dist(a: Column, b: Column) -> Column:
    """Euclidean distance of two ARRAY<numeric> columns, double precision,
    summed in index order (matches DuckDB ``list_distance`` exactly)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(
            F.zip_with(da, db, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def kmeans_assign_onestep(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One deterministic Lloyd assignment step: centroids are the vectors
    with the ``n_centroids`` smallest ids (a fixed, reproducible seeding —
    k-means++ randomness would break oracle comparison), every vector goes
    to its nearest centroid by euclidean distance, ties to the lower
    centroid id.

    The scale shape of EVERY Lloyd iteration: centroids broadcast (k × dim
    doubles), assignment is one map-side pass over the corpus, and the
    update step (not run here) is a partial+final mean-by-cluster agg. The
    full iterative loop lives in the SemDeDup path (`_kmeans_fit` on a
    bounded sample); this exposes the distributed assignment primitive."""
    cents = vectors.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec")
    )
    scored = vectors.select(id_col, vec_col).crossJoin(F.broadcast(cents)).select(
        id_col,
        "cid",
        euclidean_dist(F.col(vec_col), F.col("c_vec")).alias("_d"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d"), F.col("cid"))
    return (
        scored.select(
            id_col,
            F.col("cid").alias("cluster"),
            F.round("_d", 4).alias("dist"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full distributed Lloyd k-means over the embedding corpus.

    Per iteration: centroids (k × dim doubles — kilobytes, NOT corpus-sized)
    are broadcast for a map-side nearest-centroid assignment, then the
    update is one partial+final aggregation (per-dimension avg per
    cluster). Only the k × dim centroid matrix ever reaches the driver —
    the same contract as MLlib's KMeans — so the loop is 100 TB-legal: the
    corpus is scanned ``iters`` times and shuffled never (the update agg
    combines map-side).

    Deterministic: init = the k lowest-id vectors, ties to the lower
    centroid id, no RNG anywhere. Returns (assignments DataFrame, centroid
    list, inertia-per-iteration list).
    """
    dim = len(vectors.select(vec_col).first()[0])
    cents_rows = (
        vectors.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"))
        .collect()
    )
    cents = {int(r.cid): [float(x) for x in r.c_vec] for r in cents_rows}
    spark = vectors.sparkSession
    inertia_history = []
    assign = None
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(cents.items())], "cid int, c_vec array<double>"
        )
        scored = vectors.select(id_col, vec_col).crossJoin(F.broadcast(cdf)).select(
            id_col,
            vec_col,
            "cid",
            euclidean_dist(F.col(vec_col), F.col("c_vec")).alias("_d"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("_d"), F.col("cid"))
        assign = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, vec_col, F.col("cid").alias("cluster"), F.col("_d").alias("dist"))
        )
        stats = assign.groupBy("cluster").agg(
            F.sum(F.col("dist") * F.col("dist")).alias("sse"),
            *[F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}") for i in range(dim)],
        )
        rows = stats.collect()  # k rows of dim+1 doubles — bounded by k, not N
        inertia_history.append(float(sum(r.sse for r in rows)))
        new_cents = {int(r.cluster): [r[f"m{i}"] for i in range(dim)] for r in rows}
        # a cluster that captured no points keeps its previous centroid so k
        # never silently shrinks (standard Lloyd empty-cluster handling)
        cents = {cid: new_cents.get(cid, vec) for cid, vec in cents.items()}
    return assign.select(id_col, "cluster", F.round("dist", 4).alias("dist")), cents, inertia_history


def contamination_screen(
    vectors: DataFrame,
    heldout: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: corpus rows whose embedding is close to
    any held-out (eval/benchmark) embedding — the vector-space companion
    to the 8-gram lexical decontaminator (``operators/dedup.py``,
    ``contamination_hits``). Text paraphrases of a benchmark question slip
    past n-gram matching; their embeddings don't.

    Plan: the held-out matrix is the small side (an eval set — thousands of
    rows, not billions) collected once and closed over into a
    ``mapInPandas`` kernel; each Arrow batch of corpus vectors does ONE
    float64 BLAS matmul against it — the same broadcast-matrix shape as
    :func:`brute_force_topk_np`, zero shuffle, embarrassingly parallel over
    100 TB of corpus. Returns (vec_id, max_cos, n_hits) for flagged rows.
    """
    h_rows = heldout.select(vec_col).collect()
    H = np.asarray([r[0] for r in h_rows], dtype=np.float64)
    Hn = H / np.maximum(np.linalg.norm(H, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ Hn.T  # (batch, n_heldout)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "max_cos": sims.max(axis=1),
                    "n_hits": (sims >= threshold).sum(axis=1).astype(np.int64),
                }
            )

    return (
        vectors.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} bigint, max_cos double, n_hits bigint")
        .filter(F.col("n_hits") > 0)
        .select(id_col, F.round("max_cos", 4).alias("max_cos"), "n_hits")
    )


def lsh_oracle_sql(
    k: int = 5,
    dim: int = 64,
    num_tables: int = 16,
    bits_per_table: int = 4,
    seed: int = 42,
    query_pred: str = "vec_id < 20",
) -> str:
    """DuckDB twin of :func:`lsh_bucket_topk` — EXACT, not statistical: the
    seeded hyperplanes are deterministic constants, so the oracle embeds the
    same plane weights as SQL literals and replays bucketing bit-for-bit.

    Float parity: Spark computes each plane dot as a left-to-right fold of
    double products; the oracle writes the same dot as an explicit
    left-associative sum chain over ``embedding::DOUBLE[]``, which is the
    identical IEEE operation sequence — so every sign bit (hence every
    bucket, hence the candidate set) matches exactly. Buckets are encoded
    as table-qualified tokens (t*2^bits + bucket) and candidacy is
    ``list_has_any``, mirroring the Spark explode+equi-join. The re-rank
    uses the same scoring SQL as the brute-force oracle key."""
    planes = random_hyperplanes(dim, num_tables, bits_per_table, seed)
    toks = []
    for t in range(num_tables):
        bits = []
        for b in range(bits_per_table):
            dot = " + ".join(f"v[{i + 1}]*{planes[t, b, i]!r}" for i in range(dim))
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
        toks.append(f"{t * (1 << bits_per_table)} + " + " + ".join(bits))
    tok_list = ",\n        ".join(toks)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
    SELECT vec_id, v, [
        {tok_list}
    ] AS toks FROM emb
),
cand AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.v AS qv, n.v AS nv
    FROM (SELECT * FROM b WHERE {query_pred}) q, b n
    WHERE n.vec_id <> q.vec_id AND list_has_any(q.toks, n.toks)
),
scored AS (
    SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS c FROM cand
),
ranked AS (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, round(c, 4) AS cos, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# IVF with a FROZEN pretrained codebook — the oracle-exact variant
# ---------------------------------------------------------------------------

def fixed_ivf_centroids(nlist: int = 16, dim: int = 64, seed: int = 7) -> np.ndarray:
    """Deterministic pretrained codebook: seeded Gaussian directions,
    unit-normalized, then ROUNDED to 6 decimals — the rounding makes every
    coordinate an exact decimal literal both engines parse to the same
    double, which is what lets the oracle replay assignment bit-for-bit.
    Production IVF indexes load a trained codebook exactly like this;
    ann_ivf_top5 keeps the corpus-trained (recall-tested) path."""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((nlist, dim))
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return np.round(C, 6)


def _fixed_assign_udf(CT: np.ndarray, np_probe: int):
    """pandas UDF assigning each vector its top-``np_probe`` frozen
    centroids (indices into the codebook), accumulating similarities with
    the explicit per-dimension SEQUENTIAL loop — the same IEEE order as
    the oracle's literal sum chains, which is what makes assignment
    bit-reproducible in SQL.  Shared by :func:`ivf_fixed_topk` and
    :func:`semantic_dedup_fixed_pairs` (one kernel, one certified
    semantics — the r12 no-copy rule)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        if X.ndim != 2 or X.shape[0] == 0:
            return pd.Series([], dtype=object)
        s = np.zeros((X.shape[0], CT.shape[1]), dtype=np.float64)
        for d in range(CT.shape[0]):  # sequential: oracle-order-exact
            s += X[:, d : d + 1] * CT[d][None, :]
        order = np.argsort(-s, axis=1, kind="stable")  # ties -> lower id
        return pd.Series(order[:, :np_probe].astype(np.int32).tolist())

    return assign


def ivf_fixed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k against the frozen codebook, oracle-EXACT: centroid
    similarities accumulate with the explicit per-dimension sequential loop
    (same IEEE order as the oracle's literal sum chains), probes rank by
    (sim desc, centroid id) with a stable sort, candidates join on the
    bucket, and the re-rank is the exact cosine. Same plan shape as
    :func:`ivf_topk`; only the codebook source and the order-exact
    assignment differ."""
    C = fixed_ivf_centroids(nlist, dim)
    CT = C.T.copy()  # (dim, nlist)

    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v_assigned = v.withColumn(
        "cluster", F.element_at(_fixed_assign_udf(CT, 1)(F.col("n_vec")), 1)
    )
    q_assigned = q.withColumn(
        "cluster", F.explode(_fixed_assign_udf(CT, nprobe)(F.col("q_vec")))
    )
    candidates = (
        v_assigned.join(F.broadcast(q_assigned), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "n_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        candidates.select(
            "query_id", "neighbor_id", cosine_sim_named("q_vec", "n_vec").alias("_cos")
        )
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos"), F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def _fixed_assign_cte_sql(nlist: int, dim: int) -> str:
    """Shared WITH-clause prefix (``emb``/``sims``/``assigned``) for every
    frozen-codebook oracle: centroid similarities as explicit
    left-associative literal sum chains (IEEE-order-identical to
    :func:`_fixed_assign_udf`'s sequential accumulation) ranked by
    (sim DESC, centroid id).  ONE generator so the oracles that share the
    one Python kernel cannot desync from it (r12 review)."""
    C = fixed_ivf_centroids(nlist, dim)
    sims = ",\n        ".join(
        " + ".join(f"v[{d + 1}]*{C[c, d]!r}" for d in range(dim)) for c in range(nlist)
    )
    return f"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
    SELECT vec_id, v, [
        {sims}
    ] AS s FROM emb
),
assigned AS (
    SELECT vec_id, v, CAST(ci - 1 AS INT) AS cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY s[CAST(ci AS INT)] DESC, ci) AS prb
    FROM sims, unnest(generate_series(1, {nlist})) AS t(ci)
)"""


def ivf_fixed_oracle_sql(
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    query_pred: str = "vec_id < 20",
) -> str:
    """DuckDB twin of :func:`ivf_fixed_topk`: the shared frozen-assignment
    CTE prefix, bucket equi-join, exact-cosine re-rank."""
    return f"""
WITH {_fixed_assign_cte_sql(nlist, dim)},
vv AS (SELECT vec_id AS neighbor_id, v AS nv, cluster FROM assigned WHERE prb = 1),
qq AS (SELECT vec_id AS query_id, v AS qv, cluster FROM assigned
       WHERE prb <= {nprobe} AND {query_pred}),
scored AS (
    SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS c
    FROM vv JOIN qq USING (cluster)
    WHERE query_id <> neighbor_id
),
rk AS (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, round(c, 4) AS cos, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# PCA projection with FROZEN pretrained components — oracle-exact
# ---------------------------------------------------------------------------

def fixed_pca_components(n_components: int = 4, dim: int = 64, seed: int = 11) -> np.ndarray:
    """Deterministic pretrained PCA basis: seeded Gaussian directions
    orthonormalized by QR, then ROUNDED to 6 decimals so every coordinate
    is an exact decimal literal both engines parse to the identical double
    (the frozen-artifact shape of ``fixed_ivf_centroids`` — production
    pipelines load a trained PCA exactly like this and only ever run the
    APPLY step in the data path; the O(dim²)-memory training fit belongs
    offline, like IVF/PQ codebook training)."""
    rng = np.random.default_rng(seed)
    W, _ = np.linalg.qr(rng.standard_normal((dim, n_components)))
    return np.round(W, 6)


def pca_project(
    vectors: DataFrame,
    n_components: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Project each embedding onto the frozen components — the
    dimensionality-reduction APPLY step of a training-data pipeline
    (compact ANN indexes, cluster features, drift monitors all consume
    these coordinates). Adds an ``array<double>`` column ``pc``.

    Exactness: each coordinate accumulates with the explicit
    per-dimension sequential loop (``s += X[:,d]·W[d]``) — the identical
    IEEE operation order as the oracle's left-associative literal sum
    chains (``pca_oracle_chains``), so every projected double is
    bit-identical cross-engine. BLAS matmul would pairwise-reorder the
    sums. Zero shuffle: the components ride in the UDF closure."""
    W = fixed_pca_components(n_components, dim)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def proj(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        if X.ndim != 2 or X.shape[0] == 0:
            return pd.Series([], dtype=object)
        s = np.zeros((X.shape[0], W.shape[1]), dtype=np.float64)
        for d in range(W.shape[0]):  # sequential in d => fold-order-exact
            s += X[:, d : d + 1] * W[d][None, :]
        return pd.Series(s.tolist())

    return vectors.withColumn("pc", proj(F.col(vec_col)))


def pca_oracle_chains(n_components: int = 4, dim: int = 64) -> list:
    """Left-associative SQL sum chains computing exactly the ``pc``
    coordinates of :func:`pca_project` over ``v`` (``embedding::DOUBLE[]``)
    — generated from the same frozen components so the two can't drift."""
    W = fixed_pca_components(n_components, dim)
    return [
        " + ".join(f"v[{d + 1}]*{W[d, j]!r}" for d in range(dim))
        for j in range(n_components)
    ]
