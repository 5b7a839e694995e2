"""Regenerate the frozen PQ codebook literals in operators/pq.py.

Trains per-subspace k-means (15 Lloyd iterations, deterministic first-K
init, argmin ties -> lowest centroid id) over the sf0.01 embeddings in
integer micro-units, rounds centroids to integers, and prints the literal
block. The committed PQ_CODEBOOK was produced by exactly this script; it
is FROZEN so both engines replay encoding/ranking on identical integers.
"""

import duckdb
import numpy as np

SF_PARQUET = "/root/testdata/sf0.01/embeddings.parquet"
M, K, SUB = 16, 16, 4


def main() -> None:
    X = np.array(
        duckdb.sql(
            f"SELECT embedding::DOUBLE[] FROM '{SF_PARQUET}' ORDER BY vec_id"
        ).fetchnumpy()["CAST(embedding AS DOUBLE[])"].tolist()
    )
    Xi = np.floor(X * 1e6).astype(np.int64)
    print("PQ_CODEBOOK: list[list[list[int]]] = [")
    for m in range(M):
        S = Xi[:, m * SUB : (m + 1) * SUB].astype(np.float64)
        C = S[:K].copy()
        for _ in range(15):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for k in range(K):
                sel = S[a == k]
                if len(sel):
                    C[k] = sel.mean(axis=0)
        B = np.round(C).astype(np.int64)
        print("    [")
        for k in range(K):
            print("        [" + ", ".join(str(v) for v in B[k]) + "],")
        print("    ],")
    print("]")


if __name__ == "__main__":
    main()
