"""Distributed k-means pinned to a single-process Lloyd reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import clustering


def _brute_kmeans(X, k, iters):
    C = X[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    return C


def test_kmeans_matches_brute_force(ray_session):
    rng = np.random.RandomState(17)
    X = rng.randn(300, 6)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(300, dtype=np.int64),
            "embedding": [list(map(float, r)) for r in X],
        }
    )
    out = clustering.kmeans_fit(rd.from_pandas(df), k=5, iters=3)
    C = _brute_kmeans(X, 5, 3)
    got = out.pivot(index="centroid_id", columns="dim_idx", values="value").to_numpy()
    assert np.allclose(got, C, atol=1e-9)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # an isolated far point is its own cluster; the near mass never
    # migrates the far centroid
    X = np.vstack(
        [np.zeros((1, 2)), np.full((1, 2), 100.0), np.zeros((20, 2)) + 0.01]
    )
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": [list(map(float, r)) for r in X],
        }
    )
    out = clustering.kmeans_fit(rd.from_pandas(df), k=2, iters=2)
    far = out[out["centroid_id"] == 1].sort_values("dim_idx")["value"].to_numpy()
    assert np.allclose(far, [100.0, 100.0])


def _brute_semantic_dedup(X, k, iters, threshold):
    C = _brute_kmeans(X, k, iters)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    M = X / np.linalg.norm(X, axis=1, keepdims=True)
    keep = np.ones(len(X), dtype=bool)
    for j in range(len(X)):
        for i in range(j):
            if a[i] == a[j] and float(M[i] @ M[j]) >= threshold:
                keep[j] = False
                break
    return a, keep


def test_semantic_dedup_matches_brute_force(ray_session):
    rng = np.random.RandomState(23)
    # planted near-dups: pairs of almost-identical vectors
    base = rng.randn(80, 8)
    dups = base[:20] + rng.randn(20, 8) * 0.01
    X = np.vstack([base, dups])
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": [list(map(float, r)) for r in X],
        }
    )
    out = (
        clustering.semantic_dedup(
            rd.from_pandas(df), k=4, iters=2, threshold=0.95, num_buckets=4
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    a, keep = _brute_semantic_dedup(X, 4, 2, 0.95)
    assert len(out) == len(X)
    assert (out["cluster_id"].to_numpy() == a).all()
    assert (out["keep"].to_numpy().astype(bool) == keep).all()
    assert (~keep).sum() >= 15  # the planted dups are actually dropped


def test_embedding_covariance_exact_and_pca(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.clustering import (
        COV_BP,
        embedding_covariance,
        pca_topk,
    )

    rng = np.random.RandomState(5)
    X = (rng.randn(120, 6) * 0.3).astype(np.float32)
    emb = pd.DataFrame({"embedding": [row for row in X]})
    got = embedding_covariance(
        rd.from_pandas(emb).repartition(4), num_buckets=4
    ).to_pandas()

    Q = np.floor(X.astype(np.float64) * COV_BP).astype(np.int64)
    n = len(Q)
    exp_rows = []
    for i in range(6):
        for j in range(i, 6):
            exp_rows.append(
                (i + 1, j + 1, n * int(Q[:, i] @ Q[:, j])
                 - int(Q[:, i].sum()) * int(Q[:, j].sum()))
            )
    exp = pd.DataFrame(exp_rows, columns=["dim_i", "dim_j", "cov_num"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )

    # principal directions track numpy PCA of the quantized matrix
    comps = pca_topk(got, k=2)
    Xc = Q - Q.mean(axis=0)
    w, v = np.linalg.eigh(Xc.T @ Xc)
    top = v[:, np.argsort(w)[::-1][:2]].T
    flip = np.sign(top[np.arange(2), np.abs(top).argmax(axis=1)])
    top = top * flip[:, None]
    assert np.allclose(np.abs(comps @ top.T), np.eye(2), atol=1e-6)


def test_ivf_assign_kmeans_matches_lloyd_assignment(ray_session):
    """ivf_assign(centroids='kmeans') must place every vector in the
    Voronoi cell of the kmeans_matrix codebook under the fit's own
    Euclidean/ties-to-lowest-cid discipline (round-5 kmeans IVF mode)."""
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.clustering import (
        _assign, kmeans_matrix,
    )
    from bio_re_with_entity_embeddings_ray.stages.scoring import ivf_assign

    rng = np.random.RandomState(11)
    X = rng.randn(60, 4)
    emb = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64),
         "embedding": [row.tolist() for row in X]}
    )
    ds = rd.from_pandas(emb).repartition(3)
    got = (
        ivf_assign(ds, n_centroids=4, centroids="kmeans", iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    C = kmeans_matrix(ds, k=4, iters=2)
    exp = _assign(X, C).astype(np.int64)
    assert (got["centroid_id"].to_numpy() == exp).all()
