"""Unit coverage for the oracle-checkable model-scoring projections:
deterministic classifier weights, vector explode to bp, float->bp column
projection. The end-to-end value parity vs DuckDB is covered by
tools/check_oracles.py (scored_triples / classified_triples /
learned_embeddings)."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import embedding_train, scoring


def test_classifier_weights_deterministic_and_bounded():
    w1 = scoring.default_classifier_weights(64)
    w2 = scoring.default_classifier_weights(64)
    assert w1.shape == (128,)
    assert np.array_equal(w1, w2)
    assert np.all(np.abs(w1) <= 0.3)
    # not degenerate: weights vary
    assert len(np.unique(np.round(w1, 6))) > 100


def test_explode_vectors_bp(ray_session):
    df = pd.DataFrame(
        {
            "tag": ["a", "b"],
            "vector": [np.array([0.5, -0.25]), np.array([0.0, 1.0])],
        }
    )
    out = (
        embedding_train.explode_vectors_bp(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["tag", "dim_idx"])
        .reset_index(drop=True)
    )
    assert list(out["tag"]) == ["a", "a", "b", "b"]
    assert list(out["dim_idx"]) == [0, 1, 0, 1]
    assert list(out["value_bp"]) == [500000, -250000, 0, 1000000]
    assert out["value_bp"].dtype == np.int64


def test_project_bp(ray_session):
    df = pd.DataFrame({"k": [1, 2], "score": [0.1234567, -0.5]})
    out = (
        scoring.project_bp(rd.from_pandas(df), "score", "score_bp")
        .to_pandas()
        .sort_values("k")
    )
    assert "score" not in out.columns
    assert list(out["score_bp"]) == [123457, -500000]


def test_lsh_assign_and_search_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.scoring import (
        LSH_BP,
        _lsh_sign_matrix,
        ann_lsh_search,
        lsh_assign,
    )

    rng = np.random.RandomState(13)
    X = rng.randn(80, 12)
    emb = pd.DataFrame(
        {"vec_id": np.arange(80, dtype=np.int64), "embedding": [r for r in X]}
    )
    ds = rd.from_pandas(emb).repartition(4)

    S = _lsh_sign_matrix(12)
    Q = np.floor(X * LSH_BP).astype(np.int64)
    exp_buckets = ((Q @ S.T > 0).astype(np.int64) << np.arange(8)).sum(axis=1)
    got = lsh_assign(ds).to_pandas().sort_values("vec_id")
    assert (got["bucket"].to_numpy() == exp_buckets).all()

    res = ann_lsh_search(ds, n_queries=5, k=3, num_buckets=4).to_pandas()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for qid in range(5):
        cands = [
            j
            for j in range(80)
            if j != qid and exp_buckets[j] == exp_buckets[qid]
        ]
        sims = [(float(Xn[qid] @ Xn[j]), j) for j in cands]
        exp_order = [j for s, j in sorted(sims, key=lambda t: (-t[0], t[1]))][:3]
        got_order = (
            res[res["qid"] == qid].sort_values("rank")["nid"].tolist()
        )
        assert got_order == exp_order, (qid, got_order, exp_order)


def test_lsh_assign_handles_empty_blocks(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.scoring import (
        ann_lsh_search,
        lsh_assign,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(4, 8)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(30, dtype=np.int64),
            # clustered vectors (tiny jitter) so buckets collide and the
            # search result is non-empty
            "embedding": [
                base[i % 4] + rng.randn(8) * 1e-3 for i in range(30)
            ],
        }
    )
    # a filter that empties some blocks entirely
    ds = rd.from_pandas(emb).repartition(6).filter(expr="vec_id < 12")
    got = lsh_assign(ds).to_pandas()
    assert len(got) == 12
    res = ann_lsh_search(ds, n_queries=3, k=2, num_buckets=2).to_pandas()
    assert len(res) > 0
    assert set(res.columns) == {"qid", "nid", "rank"}
