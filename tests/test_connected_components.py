"""Distributed connected components (min-label propagation) and the
near-dup curation composition built on it."""

import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.pipelines import curate
from bio_re_with_entity_embeddings_ray.stages import dedup


def _cc(pairs_df, num_buckets=4):
    return (
        dedup.connected_components(rd.from_pandas(pairs_df), num_buckets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_chain_component_converges_to_min():
    # worst-case diameter: a path 9-8-7-...-0 needs the most rounds
    pairs = pd.DataFrame({"doc_a": range(9), "doc_b": range(1, 10)})
    out = _cc(pairs)
    assert list(out["doc_id"]) == list(range(10))
    assert set(out["cluster_id"]) == {0}


def test_separate_components_and_star():
    pairs = pd.DataFrame(
        {
            "doc_a": [1, 1, 1, 50, 60],
            "doc_b": [2, 3, 4, 60, 70],
        }
    )
    out = _cc(pairs)
    by = dict(zip(out["doc_id"], out["cluster_id"]))
    assert by == {1: 1, 2: 1, 3: 1, 4: 1, 50: 50, 60: 50, 70: 50}


def test_empty_pairs():
    pairs = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
        }
    )
    ds = dedup.connected_components(rd.from_pandas(pairs), 4)
    assert ds.count() == 0
    # schema survives even though Ray's to_pandas drops columns on empties
    assert ds.schema().names == ["doc_id", "cluster_id"]


def test_curate_neardup_keeps_one_per_cluster():
    # docs 0/1 are exact dups (same bands -> same cluster); 2 unrelated;
    # 3 fails the quality filter (repeated token)
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon zeta",
                    "one two three four five six seven",
                    "a a a a a a a a",
                ],
            }
        )
    )
    out = curate.curate_neardup(docs, num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2]


def _uf_clusters(pairs_df):
    """Brute-force union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find():
    import numpy as np

    rng = np.random.RandomState(11)
    for trial in range(3):
        n_nodes = 60
        n_edges = [20, 60, 150][trial]  # sparse -> dense
        a = rng.randint(0, n_nodes, n_edges)
        b = rng.randint(0, n_nodes, n_edges)
        keep = a != b
        pairs = pd.DataFrame(
            {"doc_a": np.minimum(a, b)[keep], "doc_b": np.maximum(a, b)[keep]}
        )
        cc = _cc(pairs)
        got = dict(zip(cc["doc_id"], cc["cluster_id"]))
        want = _uf_clusters(pairs)
        assert got == want, f"trial {trial}"


def test_actor_cc_matches_dataset_cc(ray_session):
    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages import cc_actors

    rng = np.random.RandomState(23)
    for n_edges in (15, 120):
        a = rng.randint(0, 50, n_edges)
        b = rng.randint(0, 50, n_edges)
        keep = a != b
        pairs = pd.DataFrame(
            {"doc_a": np.minimum(a, b)[keep], "doc_b": np.maximum(a, b)[keep]}
        )
        ds_out = _cc(pairs)
        actor_out = cc_actors.connected_components_actors(
            rd.from_pandas(pairs), num_shards=4
        )
        pd.testing.assert_frame_equal(
            ds_out[["doc_id", "cluster_id"]], actor_out, check_dtype=False
        )


def test_actor_cc_chain_and_empty(ray_session):
    from bio_re_with_entity_embeddings_ray.stages import cc_actors

    chain = pd.DataFrame({"doc_a": range(19), "doc_b": range(1, 20)})
    out = cc_actors.connected_components_actors(rd.from_pandas(chain), num_shards=3)
    assert set(out["cluster_id"]) == {0} and len(out) == 20

    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
    )
    out = cc_actors.connected_components_actors(rd.from_pandas(empty), num_shards=2)
    assert len(out) == 0
