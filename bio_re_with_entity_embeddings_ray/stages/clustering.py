"""Distributed k-means (Lloyd iterations) over an embedding column.

The iterative-algorithm family: each iteration is one streaming pass —
broadcast centroids (``ray.put`` once per iteration), per-batch partial
(cluster, count, per-dim sum) combiners, and an O(k x d) driver update.
Nothing but k x d floats ever sits on the driver; the corpus is read
``iters`` times and never shuffled (assignment is a pure narrow map).
This is the canonical Ray shape for EM-style iterations — the Dataset
API cannot hold mutable centroid state across passes, so the loop lives
in the caller while each pass stays a streaming aggregate.

Determinism contract (what the DuckDB oracle mirrors, 2 unrolled
iterations): init centroids = embeddings of ``vec_id < k`` (ascending);
assignment = argmin euclidean distance with ties to the lowest centroid
id; update = per-dim mean of assigned vectors; an empty cluster keeps
its previous centroid. Float math is float64 on both sides; the oracle
compares the exploded (centroid_id, dim_idx, value_bp) integer
projection (same discipline as scored_triples).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _assign(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest centroid per row, squared euclidean, ties -> lowest index
    (argmin keeps the first minimum)."""
    d2 = (
        (M * M).sum(axis=1, keepdims=True)
        - 2.0 * (M @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1)


def kmeans_fit(emb, k: int = 8, iters: int = 2):
    """Lloyd's algorithm; returns the final (k, d) centroid matrix as a
    pandas DataFrame (centroid_id, dim_idx, value) in float64."""
    import ray

    init = (
        emb.filter(expr=f"vec_id < {k}").to_pandas().sort_values("vec_id")
    )
    if len(init) == 0:
        raise ValueError(f"kmeans_fit: no rows with vec_id < {k} for init")
    C = np.array(init["embedding"].tolist(), dtype=np.float64)
    k, d = C.shape

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            Cb = ray.get(cref)
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            a = _assign(M, Cb)
            cols = {"cid": np.arange(len(Cb), dtype=np.int64)}
            cols["cnt"] = np.bincount(a, minlength=len(Cb)).astype(np.int64)
            for j in range(M.shape[1]):
                cols[f"s{j}"] = np.bincount(
                    a, weights=M[:, j], minlength=len(Cb)
                )
            return pd.DataFrame(cols)

        parts = (
            emb.map_batches(partial, batch_format="pandas", batch_size=None)
            .to_pandas()  # k x blocks rows — bounded by k, not corpus size
            .groupby("cid")
            .sum()
            .sort_index()
        )
        cnt = parts["cnt"].to_numpy()
        sums = parts[[f"s{j}" for j in range(d)]].to_numpy()
        nz = cnt > 0
        C = C.copy()
        C[nz] = sums[nz] / cnt[nz, None]  # empty clusters keep old centroid

    rows = {
        "centroid_id": np.repeat(np.arange(k, dtype=np.int64), d),
        "dim_idx": np.tile(np.arange(1, d + 1, dtype=np.int64), k),
        "value": C.reshape(-1),
    }
    return pd.DataFrame(rows)


def kmeans_centroids_bp(emb, k: int = 8, iters: int = 2):
    """(centroid_id, dim_idx, value_bp) — the integer projection the
    oracle compares (value_bp = floor(value * 10000), float64 both
    sides)."""
    out = kmeans_fit(emb, k, iters)
    out["value_bp"] = np.floor(out["value"].to_numpy() * 10000).astype(np.int64)
    return out[["centroid_id", "dim_idx", "value_bp"]]


def kmeans_matrix(emb, k: int = 8, iters: int = 2) -> np.ndarray:
    """Final (k, d) centroid matrix as float64 numpy (same fit as
    :func:`kmeans_fit`, reshaped from the long frame)."""
    long = kmeans_fit(emb, k, iters)
    return (
        long.pivot(index="centroid_id", columns="dim_idx", values="value")
        .sort_index()
        .to_numpy()
        .astype(np.float64)
    )


def semantic_dedup(emb, k: int = 8, iters: int = 2, threshold: float = 0.4,
                   num_buckets: int = 16):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): k-means-cluster the embedding space, then WITHIN each
    cluster mark as duplicate every vector that has cosine similarity >=
    ``threshold`` with a lower-``vec_id`` member of the same cluster
    (deterministic keep-lowest-id representative per duplicate
    neighborhood). Returns (vec_id, cluster_id, keep) for every input
    vector, keep in {0, 1}.

    Scale shape: the O(m^2) pairwise cosine runs only within a cluster —
    the whole point of SemDeDup is that k grows with corpus size so the
    per-cluster member count m stays bounded (the paper uses k ~ 100k on
    LAION). Centroids come from the streaming :func:`kmeans_fit` passes
    (driver holds k x d floats only), assignment is a narrow broadcast
    map, and clusters are co-located with ONE hash exchange keyed by
    cluster_id; each bucket resolves its clusters with a single normalized
    matmul. Nothing corpus-sized ever reaches the driver. No reference
    analog (the reference has no embedding-space dedup); the kmeans
    determinism contract above carries over verbatim.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
    )

    C = kmeans_matrix(emb, k, iters)
    cref = ray.put(C)

    class Assign:
        def __init__(self, cref):
            self.C = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            a = _assign(M, self.C)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].to_numpy(),
                    "cluster_id": a.astype(np.int64),
                    "embedding": batch["embedding"],
                }
            )

    assigned = emb.map_batches(
        Assign,
        fn_constructor_args=(cref,),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
    )

    def resolve(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cid, g in bucket.groupby("cluster_id", sort=False):
            g = g.sort_values("vec_id")
            M = np.array(g["embedding"].tolist(), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            S = M @ M.T
            dup = (np.tril(S, -1) >= threshold).any(axis=1)
            outs.append(
                pd.DataFrame(
                    {
                        "vec_id": g["vec_id"].to_numpy(),
                        "cluster_id": np.full(len(g), cid, dtype=np.int64),
                        "keep": (~dup).astype(np.int64),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster_id": pd.Series([], dtype="int64"),
                    "keep": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(assigned, "cluster_id", resolve, num_buckets)


# ---------------------------------------------------------------- PCA pass

COV_BP = 10_000  # fixed-point quantization of embedding values


def embedding_covariance(emb, num_buckets: int = 16):
    """Distributed EXACT-integer covariance accumulation over the
    embedding column — the wide half of PCA (the d x d eigendecomposition
    is O(d^3) driver work on the tiny result; :func:`pca_topk`).

    Each value is quantized once to int64 fixed point
    (``floor(v * COV_BP)``); after that every operation is integer, so
    the result is bit-identical to the SQL mirror regardless of
    batch/summation order. Per batch the partial is ONE int64 matmul
    (``M.T @ M`` upper triangle, d(d+1)/2 rows) plus the per-dim sums and
    the row count — a constant ~2k rows per block for d=64, merged
    through the lazy tree plan (bounded key space, no probe barrier).
    Output: (dim_i, dim_j, cov_num) for i <= j, 1-based dims, where
    ``cov_num = n * Σ q_i q_j - Σ q_i * Σ q_j`` (the covariance numerator
    scaled by n^2 * COV_BP^2 — callers divide; the oracle compares the
    exact integers).

    Scale shape: narrow map + fixed-size combiner — the corpus streams
    once and nothing key-distributed ever exceeds d^2 rows. Exactness
    bound: the accumulated sums are int64-safe to ~9e10 rows, but the
    final ``n * Sxy`` products wrap int64 around n ~ 3e5 rows at
    COV_BP=10^4 — the finalize checks and raises rather than wrapping;
    lower ``COV_BP`` (precision-for-range) for larger corpora.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.floor(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64) * COV_BP
        ).astype(np.int64)
        d = M.shape[1]
        xx = M.T @ M
        iu, ju = np.triu_indices(d)
        return pd.concat(
            [
                pd.DataFrame(
                    {"i": iu + 1, "j": ju + 1, "s": xx[iu, ju]}
                ),
                pd.DataFrame(
                    {
                        "i": np.arange(1, d + 1, dtype=np.int64),
                        "j": np.full(d, -1, dtype=np.int64),
                        "s": M.sum(axis=0),
                    }
                ),
                pd.DataFrame({"i": [-1], "j": [-1], "s": [len(M)]}),
            ],
            ignore_index=True,
        )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["i", "j"], as_index=False, sort=False)["s"].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        n = int(combined.loc[(combined["i"] == -1), "s"].iloc[0])
        sx = (
            combined[(combined["j"] == -1) & (combined["i"] > 0)]
            .set_index("i")["s"]
        )
        xx = combined[combined["j"] > 0]
        # the accumulated sums are int64-safe (Sxy <= n * BP^2, fine to
        # n ~ 9e10 rows) but the FINAL products n*Sxy and Sx*Sy wrap
        # int64 around n ~ 3e5 — compute them in arbitrary-precision
        # Python ints over the d(d+1)/2-row result (driver-trivial).
        # The SQL mirror's BIGINT arithmetic covers the oracle-tested
        # domain; beyond it the engine stays exact (object dtype).
        cov = [
            n * int(v) - int(x) * int(y)
            for v, x, y in zip(
                xx["s"].to_numpy(),
                sx[xx["i"]].to_numpy(),
                sx[xx["j"]].to_numpy(),
            )
        ]
        if not all(-(2**63) <= c < 2**63 for c in cov):
            raise OverflowError(
                "embedding_covariance: n*Sxy - Sx*Sy exceeds int64 at this "
                "corpus size — lower COV_BP (coarser quantization) so the "
                "integer-exact contract (and its Arrow int64 schema) holds"
            )
        out = pd.DataFrame(
            {
                "dim_i": xx["i"].to_numpy().astype(np.int64),
                "dim_j": xx["j"].to_numpy().astype(np.int64),
                "cov_num": np.array(cov, dtype=np.int64),
            }
        )
        return out.sort_values(["dim_i", "dim_j"]).reset_index(drop=True)

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    partials = emb.map_batches(partial, batch_format="pandas")
    return merge_partials(
        partials, ["i", "j"], combine, finalize, num_buckets, plan="tree"
    )


def pca_topk(cov_df: pd.DataFrame, k: int = 4) -> np.ndarray:
    """Top-k principal directions from the integer covariance table —
    O(d^3) driver work on the d x d result (deterministic: numpy eigh on
    the symmetrized float matrix; sign fixed so each component's
    largest-|v| entry is positive). Not oracle-checked (eigenvectors are
    not SQL-expressible); pinned by pytest against numpy PCA of the raw
    matrix."""
    d = int(cov_df["dim_j"].max())
    C = np.zeros((d, d), dtype=np.float64)
    i = cov_df["dim_i"].to_numpy() - 1
    j = cov_df["dim_j"].to_numpy() - 1
    C[i, j] = cov_df["cov_num"].to_numpy()
    C[j, i] = cov_df["cov_num"].to_numpy()
    w, v = np.linalg.eigh(C)
    comps = v[:, np.argsort(w)[::-1][:k]].T  # (k, d)
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    return comps * flip[:, None]
